"""Pipeline CLI — mirrors the reference `python runner.py key=val ...`
(hydra-style dotted overrides, reference runner.py:8-16, 435-459).

Examples:
  s-volsdf testlist=scan106
  s-volsdf preset=bmvs testlist=scan4 opt_stepNs=[100000,0,0]
  s-volsdf testlist=scan106 filter_only=true
  s-volsdf testlist=scan106 create_scene=true
  s-volsdf testlist=scan106,scan114 multiscene=true
"""

import sys


def parse_testlist(testlist):
    """File of scan names, or a comma list (reference runner.py:435-441)."""
    if "txt" in testlist:
        with open(testlist) as f:
            return [line.rstrip() for line in f if line.strip()]
    return [x for x in testlist.replace(" ", "").split(",") if x]


def main(argv):
    overrides = [a for a in argv if "=" in a]
    # hydra-CLI compatibility: '+key=value' (append syntax) works like
    # 'key=value', and the reference's 'vol=bmvs' group selection maps
    # to our preset (reference config/logs.yaml usage).
    extra = {k.lstrip("+"): v
             for k, v in (o.split("=", 1) for o in overrides)}
    # NOTE: pop 'vol' first and separately — the one-liner
    # extra.pop("preset", extra.pop("vol", ...)) evaluates its default
    # eagerly, silently swallowing 'vol=' whenever 'preset=' is given.
    vol = extra.pop("vol", None)
    preset = extra.pop("preset", None)
    if preset and vol and preset != vol:
        raise SystemExit(f"conflicting preset={preset} and vol={vol}")
    preset = preset or vol or "dtu"
    create_scene = extra.pop("create_scene", "false").lower() in (
        "1", "true", "yes")
    multiscene = extra.pop("multiscene", "false").lower() in (
        "1", "true", "yes")
    mvs_weights = extra.pop("mvs_weights", None)

    from s_volsdf_tpu.config import load_config, validate_config
    cfg = validate_config(load_config(
        preset, overrides=[f"{k}={v}" for k, v in extra.items()]))

    testlist = parse_testlist(cfg.testlist)

    from s_volsdf_tpu.engine.runner import pcd_filter, save_depth
    from s_volsdf_tpu.utils.logging import get_logger
    logger = get_logger()
    logger.info(f"testlist={testlist} outdir={cfg.outdir} "
                f"exps={cfg.exps_folder}")

    if create_scene:
        from s_volsdf_tpu.engine.ibr import create_scene as cs
        for scene in testlist:
            cs(cfg, scene)
        return

    if not cfg.filter_only:
        if multiscene and len(testlist) > 1:
            # Joint lockstep VolSDF across scenes (vmap on one chip,
            # scene-sharded over a mesh) — engine/multiscene.py.
            from s_volsdf_tpu.engine.multiscene import save_depth_multiscene
            save_depth_multiscene(cfg, testlist, mvs_weights=mvs_weights)
        else:
            save_depth(cfg, testlist, mvs_weights=mvs_weights)

    pcd_filter(cfg, testlist)


def cli():
    main(sys.argv[1:])


if __name__ == "__main__":
    cli()
