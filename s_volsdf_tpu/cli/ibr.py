"""Image-based rendering CLI — mirrors the reference
`python simple_ibr.py testlist=... outdir=... evals_folder=...`
(/root/reference/simple_ibr.py:238-265): for each scan, find the latest
rendering_<epoch> dir under evals_folder and blend warped training
views into every eval view.
"""

import os
import sys


def main(argv):
    # '+key=value' hydra append syntax and the reference's 'vol=bmvs'
    # group selection both work (reference config/logs.yaml usage:
    # `python simple_ibr.py vol=bmvs ... +evals_folder=exps_result`).
    overrides = {k.lstrip("+"): v
                 for k, v in (o.split("=", 1) for o in argv if "=" in o)}
    # Pop 'vol' separately (an eager pop-inside-pop default would
    # swallow it whenever 'preset=' is also given).
    vol = overrides.pop("vol", None)
    preset = overrides.pop("preset", None)
    if preset and vol and preset != vol:
        raise SystemExit(f"conflicting preset={preset} and vol={vol}")
    preset = preset or vol or "dtu"
    evals_folder = overrides.pop("evals_folder", "exps_result")

    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.engine.ibr import image_based_render
    from s_volsdf_tpu.utils.logging import get_logger
    logger = get_logger()

    cfg = load_config(preset, overrides=[f"{k}={v}"
                                         for k, v in overrides.items()])
    from s_volsdf_tpu.cli.run import parse_testlist
    testlist = parse_testlist(cfg.testlist)

    for scan in testlist:
        scan_id = int(scan[4:])
        evaldir = os.path.join(evals_folder,
                               f"{cfg.train.expname}_{scan_id}")
        if not os.path.isdir(evaldir):
            raise SystemExit(
                f"{scan}: no eval dir {evaldir} — run the eval renderer "
                f"(s-volsdf-eval --eval_rendering) first")
        # Only all-digit rendering_<N> DIRECTORIES count: a stray
        # rendering_tmp entry or a plain file must not crash or win
        # the latest-epoch scan.
        epochs = [int(d[len("rendering_"):]) for d in os.listdir(evaldir)
                  if d.startswith("rendering_")
                  and d[len("rendering_"):].isdigit()
                  and os.path.isdir(os.path.join(evaldir, d))]
        if not epochs:
            raise SystemExit(
                f"{scan}: {evaldir} holds no rendering_<epoch> dirs — run "
                f"the eval renderer (s-volsdf-eval --eval_rendering) first")
        out_folder = os.path.join(evaldir, f"rendering_{max(epochs)}")
        scan_folder = os.path.join(cfg.outdir, scan)
        if not os.path.isdir(scan_folder):
            raise SystemExit(
                f"{scan}: no scene export {scan_folder} — run "
                f"`s-volsdf create_scene=true` first")
        logger.info(f"IBR {scan}: cams/imgs from {scan_folder}, "
                    f"renders in {out_folder}")
        image_based_render(scan_folder, out_folder,
                           cfg.dataset.data_dir, cfg.num_view)


def cli():
    main(sys.argv[1:])


if __name__ == "__main__":
    cli()
