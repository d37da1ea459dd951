// Geometric-consistency depth reprojection — the host-side fusion hot
// loop (reference helpers/utils.py:77-132 reimplemented; the Python
// engine (engine/fusion.py) keeps a vectorized-numpy fallback with
// identical semantics — this core exists because the numpy pass over
// 3x2 view pairs of 1152x1536 depth maps costs ~15 s/scene, which
// multiplied by the 11-scan DTU protocol is real wall-clock).
//
// Math (float64 throughout, matching the numpy path bit-for-purpose):
//   1. ref pixel (x, y, d) -> ref cam ray  invK_ref * (x, y, 1) * d
//   2. -> src cam  R_rs * p + t_rs, project with K_src (z clamped to
//      >= 1e-12 the same way numpy's maximum does)
//   3. bilinear-sample src depth with clamped-corner weights exactly
//      like engine/fusion.py::_bilinear_sample
//   4. lift the sampled src depth, return to ref cam via R_sr/t_sr,
//      re-project with K_ref
//   5. pixel passes if round-trip displacement < filter_dist px AND
//      relative depth difference < filter_diff; depth_out is the
//      reprojected depth where the mask holds, else 0.

#include <cmath>
#include <cstdint>

namespace {

inline double clampd(double v, double lo, double hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

inline double bilinear(const double* img, int H, int W, double x,
                       double y) {
    // Matches _bilinear_sample == cv2.remap BORDER_CONSTANT(0)
    // (reference helpers/utils.py:97): out-of-image corner
    // contributions read 0, so the border band gets partial sums and
    // fully-out samples are 0.
    double fx = std::floor(x), fy = std::floor(y);
    int64_t x0 = (int64_t)fx, y0 = (int64_t)fy;
    double wx = x - fx, wy = y - fy;
    double v = 0.0;
    const double w[4] = {(1.0 - wx) * (1.0 - wy), wx * (1.0 - wy),
                         (1.0 - wx) * wy, wx * wy};
    const int64_t cx[4] = {x0, x0 + 1, x0, x0 + 1};
    const int64_t cy[4] = {y0, y0, y0 + 1, y0 + 1};
    for (int c = 0; c < 4; ++c) {
        if (cx[c] >= 0 && cx[c] < W && cy[c] >= 0 && cy[c] < H)
            v += img[cy[c] * W + cx[c]] * w[c];
    }
    return v;
}

inline void mat3v(const double* M, double a, double b, double c,
                  double* out) {
    out[0] = M[0] * a + M[1] * b + M[2] * c;
    out[1] = M[3] * a + M[4] * b + M[5] * c;
    out[2] = M[6] * a + M[7] * b + M[8] * c;
}

}  // namespace

extern "C" void geo_consistency(
    const double* depth_ref, const double* depth_src, int64_t H, int64_t W,
    const double* invK_ref,            // 3x3 row-major
    const double* K_src, const double* invK_src, const double* K_ref,
    const double* R_rs, const double* t_rs,   // ref cam -> src cam
    const double* R_sr, const double* t_sr,   // src cam -> ref cam
    double filter_dist, double filter_diff,
    uint8_t* mask_out, double* depth_out,
    double* xs_out, double* ys_out) {
#pragma omp parallel for schedule(static)
    for (int64_t yi = 0; yi < H; ++yi) {
        for (int64_t xi = 0; xi < W; ++xi) {
            int64_t idx = yi * W + xi;
            double d = depth_ref[idx];
            double x = (double)xi, y = (double)yi;

            double pr[3], ps[3], k[3];
            mat3v(invK_ref, x * d, y * d, d, pr);
            mat3v(R_rs, pr[0], pr[1], pr[2], ps);
            ps[0] += t_rs[0]; ps[1] += t_rs[1]; ps[2] += t_rs[2];
            mat3v(K_src, ps[0], ps[1], ps[2], k);
            double z = k[2] > 1e-12 ? k[2] : 1e-12;
            double xs = k[0] / z, ys = k[1] / z;

            xs_out[idx] = xs;
            ys_out[idx] = ys;
            double sampled = bilinear(depth_src, (int)H, (int)W, xs, ys);

            double ps2[3], pr2[3];
            mat3v(invK_src, xs * sampled, ys * sampled, sampled, ps2);
            mat3v(R_sr, ps2[0], ps2[1], ps2[2], pr2);
            pr2[0] += t_sr[0]; pr2[1] += t_sr[1]; pr2[2] += t_sr[2];
            double depth_reproj = pr2[2];
            mat3v(K_ref, pr2[0], pr2[1], pr2[2], k);
            double z2 = k[2] > 1e-12 ? k[2] : 1e-12;
            double x2 = k[0] / z2, y2 = k[1] / z2;

            double dist = std::sqrt((x2 - x) * (x2 - x)
                                    + (y2 - y) * (y2 - y));
            double dref = d > 1e-12 ? d : 1e-12;
            double rel = std::fabs(depth_reproj - d) / dref;
            bool ok = dist < filter_dist && rel < filter_diff;
            mask_out[idx] = ok ? 1 : 0;
            depth_out[idx] = ok ? depth_reproj : 0.0;
        }
    }
}
