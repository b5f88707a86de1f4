// Single-core CPU reference denominators for the milestone configs
// (VERDICT r3 #5: per-config vs_baseline).  Companion to
// fclk_baseline.cpp (the headline FCLK/SSD denominator); this binary
// implements the other two *deterministic* reference hot loops natively:
//
//   esm_ncc  ESM + NCC + 8-DOF homography, 50x50, 10 iters/frame.
//            Per-iteration structure of /root/reference/SM/src/NT/ESM.cc
//            :228-263 (mean of init+current pixel Jacobians) with NCC's
//            similarity gradient (/root/reference/AM/src/NCC.cc:96-158:
//            centered/normalized patches, df/dI = (v - f*u_hat)/|u||v|).
//   rklt     GridTracker + RANSAC homography + template refiner
//            (/root/reference/SM/src/RKLT.cc:60-102: grid flow first,
//            estimator fit, then the template tracker refines from the
//            fitted warp).  10x10 grid of 10x10 px translation-LK
//            patches (GridTrackerCV.cc per-patch pyrLK analog, single
//            level), 64-hypothesis 4-point RANSAC with inlier recount
//            (SSMEstimator.cc), ESM/SSD 50x50 10-iter refinement.
//
// The stochastic-search configs (PF500, NN1k) have no C++ counterpart
// here; bench_extra measures them against the jax-CPU single-core
// denominator under the same taskset protocol (VERDICT r3 #5 allows
// this explicitly).
//
// Build: make -C native configs_baseline
// Run:   ./native/configs_baseline esm_ncc|rklt
// Output: one JSON line {"fps": ..., "max_err_px": ...}

#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <chrono>
#include <vector>

namespace {

constexpr int W = 640, H = 480;
constexpr int RES = 50;
constexpr int N = RES * RES;
constexpr int ITERS = 10;
constexpr int SP = 8;

uint64_t rng_state = 0x9E3779B97F4A7C15ull;
inline double frand() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return (double)(rng_state >> 11) * (1.0 / 9007199254740992.0);
}

void make_scene(std::vector<float>& img) {
    std::vector<double> acc((size_t)W * H);
    for (size_t i = 0; i < acc.size(); ++i) acc[i] = frand() - 0.5;
    for (int y = 0; y < H; ++y)
        for (int x = 1; x < W; ++x)
            acc[(size_t)y * W + x] += acc[(size_t)y * W + x - 1];
    for (int y = 1; y < H; ++y)
        for (int x = 0; x < W; ++x)
            acc[(size_t)y * W + x] += acc[(size_t)(y - 1) * W + x];
    double mn = 1e30, mx = -1e30;
    for (double v : acc) { if (v < mn) mn = v; if (v > mx) mx = v; }
    img.resize(acc.size());
    for (size_t i = 0; i < acc.size(); ++i)
        img[i] = (float)((acc[i] - mn) / (mx - mn) * 255.0);
}

inline void bilin_vg(const float* img, double x, double y,
                     double& val, double& gx, double& gy) {
    if (x < 0) x = 0; if (x > W - 1.001) x = W - 1.001;
    if (y < 0) y = 0; if (y > H - 1.001) y = H - 1.001;
    int x0 = (int)x, y0 = (int)y;
    double fx = x - x0, fy = y - y0;
    const float* p = img + (size_t)y0 * W + x0;
    double i00 = p[0], i01 = p[1], i10 = p[W], i11 = p[W + 1];
    val = (i00 * (1 - fx) + i01 * fx) * (1 - fy) +
          (i10 * (1 - fx) + i11 * fx) * fy;
    gx = (i01 - i00) * (1 - fy) + (i11 - i10) * fy;
    gy = (i10 - i00) * (1 - fx) + (i11 - i01) * fx;
}

inline float bilin(const float* img, double x, double y) {
    double v, gx, gy;
    bilin_vg(img, x, y, v, gx, gy);
    return (float)v;
}

template <int S>
void solveS(double A[S][S], const double b[S], double x[S]) {
    double L[S][S];
    for (int i = 0; i < S; ++i)
        for (int j = 0; j <= i; ++j) {
            double s = A[i][j];
            for (int k = 0; k < j; ++k) s -= L[i][k] * L[j][k];
            L[i][j] = (i == j) ? std::sqrt(s > 1e-12 ? s : 1e-12)
                               : s / L[j][j];
        }
    double y[S];
    for (int i = 0; i < S; ++i) {
        double s = b[i];
        for (int k = 0; k < i; ++k) s -= L[i][k] * y[k];
        y[i] = s / L[i][i];
    }
    for (int i = S - 1; i >= 0; --i) {
        double s = y[i];
        for (int k = i + 1; k < S; ++k) s -= L[k][i] * x[k];
        x[i] = s / L[i][i];
    }
}

// ---------------------------------------------------------------- ESM/NCC
struct EsmNcc {
    double warp[3][3];
    double tx[N], ty[N];
    float I0[N];
    double v0[N];                 // centered template
    double v0_norm;
    double J0[N][SP];             // init (template) Jacobians

    void pix_jac(double gx, double gy, double x, double y,
                 double wx, double wy, double invD,
                 const double a[3][3], double J[SP]) const {
        const double Gx =
            (gx * (a[0][0] - a[2][0] * wx) + gy * (a[1][0] - a[2][0] * wy))
            * invD;
        const double Gy =
            (gx * (a[0][1] - a[2][1] * wx) + gy * (a[1][1] - a[2][1] * wy))
            * invD;
        const double q = Gx * x + Gy * y;
        J[0] = Gx * x; J[1] = Gx * y; J[2] = Gx;
        J[3] = Gy * x; J[4] = Gy * y; J[5] = Gy;
        J[6] = -q * x; J[7] = -q * y;
    }

    void init(const float* img, double cx, double cy, double half) {
        int k = 0;
        for (int r = 0; r < RES; ++r)
            for (int c = 0; c < RES; ++c, ++k) {
                tx[k] = -0.5 + (double)c / (RES - 1);
                ty[k] = -0.5 + (double)r / (RES - 1);
            }
        double w0[3][3] = {{2 * half, 0, cx}, {0, 2 * half, cy}, {0, 0, 1}};
        std::memcpy(warp, w0, sizeof w0);
        double mean = 0;
        for (int i = 0; i < N; ++i) {
            double u = warp[0][0] * tx[i] + warp[0][1] * ty[i] + warp[0][2];
            double v = warp[1][0] * tx[i] + warp[1][1] * ty[i] + warp[1][2];
            double val, gx, gy;
            bilin_vg(img, u, v, val, gx, gy);
            I0[i] = (float)val;
            mean += val;
            pix_jac(gx, gy, tx[i], ty[i], (u), (v), 1.0, warp, J0[i]);
            // note: at init D == 1 for the affine-anchor warp (row 2 is
            // (0,0,1)), so invD = 1 and (wx, wy) are the image coords
        }
        mean /= N;
        double ss = 0;
        for (int i = 0; i < N; ++i) {
            v0[i] = I0[i] - mean;
            ss += v0[i] * v0[i];
        }
        v0_norm = std::sqrt(ss > 1e-12 ? ss : 1e-12);
    }

    void update(const float* img, int iters = ITERS) {
        static double It[N], gxs[N], gys[N], wxs[N], wys[N], invDs[N];
        for (int it = 0; it < iters; ++it) {
            double a[3][3];
            std::memcpy(a, warp, sizeof a);
            double mean = 0;
            for (int i = 0; i < N; ++i) {
                const double x = tx[i], y = ty[i];
                const double D = a[2][0] * x + a[2][1] * y + a[2][2];
                const double invD = 1.0 / D;
                const double wx = (a[0][0] * x + a[0][1] * y + a[0][2]) * invD;
                const double wy = (a[1][0] * x + a[1][1] * y + a[1][2]) * invD;
                double val, gx, gy;
                bilin_vg(img, wx, wy, val, gx, gy);
                It[i] = val; gxs[i] = gx; gys[i] = gy;
                wxs[i] = wx; wys[i] = wy; invDs[i] = invD;
                mean += val;
            }
            mean /= N;
            double uu = 0, uv = 0;
            for (int i = 0; i < N; ++i) {
                const double u = It[i] - mean;
                uu += u * u;
                uv += u * v0[i];
            }
            const double u_norm = std::sqrt(uu > 1e-12 ? uu : 1e-12);
            const double f = uv / (u_norm * v0_norm);
            double Hm[SP][SP] = {}, g[SP] = {};
            const double inv_un_vn = 1.0 / (u_norm * v0_norm);
            for (int i = 0; i < N; ++i) {
                const double u = It[i] - mean;
                // NCC gradient wrt current pixel (NCC.cc:96-158):
                // df/dI_i = (v_i - f * u_i * |v|/|u|) / (|u||v|)
                const double dfdI =
                    (v0[i] - f * u * v0_norm / u_norm) * inv_un_vn;
                double Jc[SP], Je[SP];
                pix_jac(gxs[i], gys[i], tx[i], ty[i], wxs[i], wys[i],
                        invDs[i], a, Jc);
                for (int s = 0; s < SP; ++s)
                    Je[s] = 0.5 * (Jc[s] + J0[i][s]);   // ESM.cc:228-230
                for (int s = 0; s < SP; ++s) {
                    g[s] += dfdI * Je[s];
                    for (int t = 0; t <= s; ++t)
                        Hm[s][t] += Je[s] * Je[t];
                }
            }
            // GN ascent with the normalized-projection Hessian
            // (NCC self Hessian ~ -J^T J / (|u||v|); the scale cancels
            // into the step via the gradient's same normalization)
            for (int s = 0; s < SP; ++s) {
                for (int t = s + 1; t < SP; ++t) Hm[s][t] = Hm[t][s];
                g[s] *= u_norm * v0_norm;   // undo normalization scale
            }
            double dp[SP];
            solveS<SP>(Hm, g, dp);
            const double dW[3][3] = {{1 + dp[0], dp[1], dp[2]},
                                     {dp[3], 1 + dp[4], dp[5]},
                                     {dp[6], dp[7], 1}};
            double nw[3][3];
            for (int r2 = 0; r2 < 3; ++r2)
                for (int c = 0; c < 3; ++c)
                    nw[r2][c] = warp[r2][0] * dW[0][c] +
                                warp[r2][1] * dW[1][c] +
                                warp[r2][2] * dW[2][c];
            const double inv22 = 1.0 / nw[2][2];
            for (int r2 = 0; r2 < 3; ++r2)
                for (int c = 0; c < 3; ++c) warp[r2][c] = nw[r2][c] * inv22;
        }
    }
};

// ------------------------------------------------------------------ RKLT
constexpr int GRID = 10;          // 10x10 grid points
constexpr int GP = GRID * GRID;
constexpr int PRES = 10;          // per-patch 10x10 px
constexpr int PN = PRES * PRES;
constexpr int SUB_ITERS = 5;
constexpr int HYPS = 64;

struct Rklt {
    double warp[3][3];            // global template->image homography
    double gx_t[GP], gy_t[GP];    // grid point template coords [-0.5, 0.5]
    float patch0[GP][PN];         // init patch per grid point
    EsmNcc refiner_geom;          // reuse the 50x50 machinery for refine
    double tx[N], ty[N];
    float I0[N];

    void init(const float* img, double cx, double cy, double half) {
        double w0[3][3] = {{2 * half, 0, cx}, {0, 2 * half, cy}, {0, 0, 1}};
        std::memcpy(warp, w0, sizeof w0);
        int k = 0;
        for (int r = 0; r < GRID; ++r)
            for (int c = 0; c < GRID; ++c, ++k) {
                gx_t[k] = -0.5 + (double)c / (GRID - 1);
                gy_t[k] = -0.5 + (double)r / (GRID - 1);
            }
        for (int p = 0; p < GP; ++p) {
            double u0 = warp[0][0] * gx_t[p] + warp[0][2];
            double v0 = warp[1][1] * gy_t[p] + warp[1][2];
            int q = 0;
            for (int r = 0; r < PRES; ++r)
                for (int c = 0; c < PRES; ++c, ++q)
                    patch0[p][q] = bilin(img, u0 + c - PRES / 2,
                                         v0 + r - PRES / 2);
        }
        // template for the SSD refiner
        k = 0;
        for (int r = 0; r < RES; ++r)
            for (int c = 0; c < RES; ++c, ++k) {
                tx[k] = -0.5 + (double)c / (RES - 1);
                ty[k] = -0.5 + (double)r / (RES - 1);
            }
        for (int i = 0; i < N; ++i)
            I0[i] = bilin(img, w0[0][0] * tx[i] + w0[0][2],
                          w0[1][1] * ty[i] + w0[1][2]);
    }

    // 4-point homography from template grid coords to image coords
    // (SSMEstimator.cc's cvFindHomography core on a minimal sample)
    static bool hom4(const double sx[4], const double sy[4],
                     const double dx[4], const double dy[4],
                     double Hm[3][3]) {
        // solve the 8x8 DLT system A h = b with h22 = 1
        double A[8][8] = {}, b[8];
        for (int i = 0; i < 4; ++i) {
            const double X = sx[i], Y = sy[i], u = dx[i], v = dy[i];
            double* r1 = A[2 * i];
            double* r2 = A[2 * i + 1];
            r1[0] = X; r1[1] = Y; r1[2] = 1; r1[6] = -u * X; r1[7] = -u * Y;
            r2[3] = X; r2[4] = Y; r2[5] = 1; r2[6] = -v * X; r2[7] = -v * Y;
            b[2 * i] = u; b[2 * i + 1] = v;
        }
        // Gaussian elimination with partial pivoting
        for (int col = 0; col < 8; ++col) {
            int best = col;
            for (int r = col + 1; r < 8; ++r)
                if (std::fabs(A[r][col]) > std::fabs(A[best][col])) best = r;
            if (std::fabs(A[best][col]) < 1e-10) return false;
            if (best != col) {
                for (int c = 0; c < 8; ++c) std::swap(A[col][c], A[best][c]);
                std::swap(b[col], b[best]);
            }
            const double inv = 1.0 / A[col][col];
            for (int r = col + 1; r < 8; ++r) {
                const double m = A[r][col] * inv;
                if (m == 0) continue;
                for (int c = col; c < 8; ++c) A[r][c] -= m * A[col][c];
                b[r] -= m * b[col];
            }
        }
        double h[8];
        for (int i = 7; i >= 0; --i) {
            double s = b[i];
            for (int c = i + 1; c < 8; ++c) s -= A[i][c] * h[c];
            h[i] = s / A[i][i];
        }
        Hm[0][0] = h[0]; Hm[0][1] = h[1]; Hm[0][2] = h[2];
        Hm[1][0] = h[3]; Hm[1][1] = h[4]; Hm[1][2] = h[5];
        Hm[2][0] = h[6]; Hm[2][1] = h[7]; Hm[2][2] = 1;
        return true;
    }

    void update(const float* img) {
        // two grid->RANSAC rounds: the reference's per-patch trackers
        // are 3-level pyramidal (GridTrackerCV.cc); a second single-
        // level round seeded from the first fit is the equivalent-
        // strength (and comparable-cost) flat analog
        for (int round = 0; round < 2; ++round) grid_fit(img);
        refine(img);
    }

    void grid_fit(const float* img) {
        // 1. per-patch translation LK from the globally-warped position
        //    (GridTrackerCV.cc: patch trackers seeded by the prior warp)
        double px[GP], py[GP];      // tracked image positions
        for (int p = 0; p < GP; ++p) {
            const double X = gx_t[p], Y = gy_t[p];
            const double D = warp[2][0] * X + warp[2][1] * Y + warp[2][2];
            double u = (warp[0][0] * X + warp[0][1] * Y + warp[0][2]) / D;
            double v = (warp[1][0] * X + warp[1][1] * Y + warp[1][2]) / D;
            for (int it = 0; it < SUB_ITERS; ++it) {
                double h00 = 0, h01 = 0, h11 = 0, g0 = 0, g1 = 0;
                int q = 0;
                for (int r = 0; r < PRES; ++r)
                    for (int c = 0; c < PRES; ++c, ++q) {
                        double val, gx, gy;
                        bilin_vg(img, u + c - PRES / 2, v + r - PRES / 2,
                                 val, gx, gy);
                        const double res = val - (double)patch0[p][q];
                        h00 += gx * gx; h01 += gx * gy; h11 += gy * gy;
                        g0 += gx * res; g1 += gy * res;
                    }
                const double det = h00 * h11 - h01 * h01;
                if (std::fabs(det) < 1e-9) break;
                u -= (h11 * g0 - h01 * g1) / det;
                v -= (-h01 * g0 + h00 * g1) / det;
            }
            px[p] = u; py[p] = v;
        }
        // 2. RANSAC homography (SSMEstimator.cc): 64 minimal samples,
        //    inlier count at 2px, refit-free best-keep (reference keeps
        //    best minimal model then recomputes with inlier mask)
        int best_inl = -1;
        double bestH[3][3];
        for (int hyp = 0; hyp < HYPS; ++hyp) {
            int idx[4];
            for (int j = 0; j < 4; ++j)
                idx[j] = (int)(frand() * GP) % GP;
            double sx[4], sy[4], dx[4], dy[4];
            for (int j = 0; j < 4; ++j) {
                sx[j] = gx_t[idx[j]]; sy[j] = gy_t[idx[j]];
                dx[j] = px[idx[j]]; dy[j] = py[idx[j]];
            }
            double Hm[3][3];
            if (!hom4(sx, sy, dx, dy, Hm)) continue;
            int inl = 0;
            for (int p = 0; p < GP; ++p) {
                const double D = Hm[2][0] * gx_t[p] + Hm[2][1] * gy_t[p] + 1;
                const double u = (Hm[0][0] * gx_t[p] + Hm[0][1] * gy_t[p] +
                                  Hm[0][2]) / D;
                const double v = (Hm[1][0] * gx_t[p] + Hm[1][1] * gy_t[p] +
                                  Hm[1][2]) / D;
                const double e2 = (u - px[p]) * (u - px[p]) +
                                  (v - py[p]) * (v - py[p]);
                if (e2 < 4.0) ++inl;
            }
            if (inl > best_inl) {
                best_inl = inl;
                std::memcpy(bestH, Hm, sizeof Hm);
            }
        }
        if (best_inl >= 4) {
            // least-squares DLT refit on the best model's inliers
            // (SSMEstimator.cc: runKernel -> refine with inlier mask)
            double AtA[8][8] = {}, Atb[8] = {};
            int n_in = 0;
            for (int p = 0; p < GP; ++p) {
                const double D = bestH[2][0] * gx_t[p] +
                                 bestH[2][1] * gy_t[p] + 1;
                const double u = (bestH[0][0] * gx_t[p] +
                                  bestH[0][1] * gy_t[p] + bestH[0][2]) / D;
                const double v = (bestH[1][0] * gx_t[p] +
                                  bestH[1][1] * gy_t[p] + bestH[1][2]) / D;
                const double e2 = (u - px[p]) * (u - px[p]) +
                                  (v - py[p]) * (v - py[p]);
                if (e2 >= 4.0) continue;
                ++n_in;
                const double X = gx_t[p], Y = gy_t[p];
                const double r1[8] = {X, Y, 1, 0, 0, 0,
                                      -px[p] * X, -px[p] * Y};
                const double r2[8] = {0, 0, 0, X, Y, 1,
                                      -py[p] * X, -py[p] * Y};
                for (int s = 0; s < 8; ++s) {
                    Atb[s] += r1[s] * px[p] + r2[s] * py[p];
                    for (int t = 0; t <= s; ++t)
                        AtA[s][t] += r1[s] * r1[t] + r2[s] * r2[t];
                }
            }
            for (int s = 0; s < 8; ++s)
                for (int t = s + 1; t < 8; ++t) AtA[s][t] = AtA[t][s];
            if (n_in >= 8) {
                double h[8];
                solveS<8>(AtA, Atb, h);
                bestH[0][0] = h[0]; bestH[0][1] = h[1]; bestH[0][2] = h[2];
                bestH[1][0] = h[3]; bestH[1][1] = h[4]; bestH[1][2] = h[5];
                bestH[2][0] = h[6]; bestH[2][1] = h[7]; bestH[2][2] = 1;
            }
            std::memcpy(warp, bestH, sizeof bestH);
        }
    }

    void refine(const float* img) {
        // 3. SSD template refinement from the fitted warp (RKLT.cc:87-99
        //    "templ_tracker->update from the grid estimate"), 10 iters
        for (int it = 0; it < ITERS; ++it) {
            double a[3][3];
            std::memcpy(a, warp, sizeof a);
            double Hm[SP][SP] = {}, g[SP] = {};
            for (int i = 0; i < N; ++i) {
                const double x = tx[i], y = ty[i];
                const double D = a[2][0] * x + a[2][1] * y + a[2][2];
                const double invD = 1.0 / D;
                const double wx = (a[0][0] * x + a[0][1] * y + a[0][2]) * invD;
                const double wy = (a[1][0] * x + a[1][1] * y + a[1][2]) * invD;
                double val, gx, gy;
                bilin_vg(img, wx, wy, val, gx, gy);
                const double r = val - (double)I0[i];
                const double Gx = (gx * (a[0][0] - a[2][0] * wx) +
                                   gy * (a[1][0] - a[2][0] * wy)) * invD;
                const double Gy = (gx * (a[0][1] - a[2][1] * wx) +
                                   gy * (a[1][1] - a[2][1] * wy)) * invD;
                const double q = Gx * x + Gy * y;
                const double J[SP] = {Gx * x, Gx * y, Gx,
                                      Gy * x, Gy * y, Gy,
                                      -q * x, -q * y};
                for (int s = 0; s < SP; ++s) {
                    g[s] += J[s] * r;
                    for (int t = 0; t <= s; ++t) Hm[s][t] += J[s] * J[t];
                }
            }
            for (int s = 0; s < SP; ++s)
                for (int t = s + 1; t < SP; ++t) Hm[s][t] = Hm[t][s];
            double dp[SP];
            solveS<SP>(Hm, g, dp);
            const double dW[3][3] = {{1 - dp[0], -dp[1], -dp[2]},
                                     {-dp[3], 1 - dp[4], -dp[5]},
                                     {-dp[6], -dp[7], 1}};
            double nw[3][3];
            for (int r2 = 0; r2 < 3; ++r2)
                for (int c = 0; c < 3; ++c)
                    nw[r2][c] = warp[r2][0] * dW[0][c] +
                                warp[r2][1] * dW[1][c] +
                                warp[r2][2] * dW[2][c];
            const double inv22 = 1.0 / nw[2][2];
            for (int r2 = 0; r2 < 3; ++r2)
                for (int c = 0; c < 3; ++c) warp[r2][c] = nw[r2][c] * inv22;
        }
    }
};

template <class T>
double corner_err(const T& trk, const double base[3][3]) {
    const double cs[4][2] = {{-.5, -.5}, {.5, -.5}, {.5, .5}, {-.5, .5}};
    double worst = 0;
    for (auto& c : cs) {
        double d0 = base[2][0] * c[0] + base[2][1] * c[1] + base[2][2];
        double u0 = (base[0][0] * c[0] + base[0][1] * c[1] + base[0][2]) / d0;
        double v0 = (base[1][0] * c[0] + base[1][1] * c[1] + base[1][2]) / d0;
        double d1 = trk.warp[2][0] * c[0] + trk.warp[2][1] * c[1] +
                    trk.warp[2][2];
        double u1 = (trk.warp[0][0] * c[0] + trk.warp[0][1] * c[1] +
                     trk.warp[0][2]) / d1;
        double v1 = (trk.warp[1][0] * c[0] + trk.warp[1][1] * c[1] +
                     trk.warp[1][2]) / d1;
        double e = std::sqrt((u1 - u0) * (u1 - u0) + (v1 - v0) * (v1 - v0));
        if (e > worst) worst = e;
    }
    return worst;
}

template <class T>
void jitter(T& trk, const double base[3][3], double t_amp) {
    std::memcpy(trk.warp, base, 9 * sizeof(double));
    trk.warp[0][2] += (frand() - 0.5) * t_amp;
    trk.warp[1][2] += (frand() - 0.5) * t_amp;
    trk.warp[0][0] *= 1.0 + (frand() - 0.5) * 0.02;
    trk.warp[1][1] *= 1.0 + (frand() - 0.5) * 0.02;
}

template <class T>
int run(const float* img, double t_amp, const char* name) {
    T trk;
    trk.init(img, 320.0, 240.0, 50.0);
    double base[3][3];
    std::memcpy(base, trk.warp, sizeof base);
    // convergence self-check
    double worst = 0;
    int ok = 0;
    const bool dbg = std::getenv("BASELINE_DEBUG") != nullptr;
    for (int s = 0; s < 10; ++s) {
        jitter(trk, base, t_amp);
        double e0 = corner_err(trk, base);
        trk.update(img);
        double e = corner_err(trk, base);
        if (dbg) std::fprintf(stderr, "trial %d: jitter %.2f -> %.4f\n",
                              s, e0, e);
        if (e > worst) worst = e;
        if (e < 0.5) ++ok;
    }
    if (ok < 9) {
        std::printf("{\"config\": \"%s\", \"fps\": null, "
                    "\"max_err_px\": %.3f}\n", name, worst);
        return 1;
    }
    const int WARMUP = 20, STEPS = 200;
    for (int s = 0; s < WARMUP; ++s) { jitter(trk, base, t_amp); trk.update(img); }
    auto t0 = std::chrono::steady_clock::now();
    for (int s = 0; s < STEPS; ++s) { jitter(trk, base, t_amp); trk.update(img); }
    auto t1 = std::chrono::steady_clock::now();
    double fps = STEPS / std::chrono::duration<double>(t1 - t0).count();
    std::printf("{\"config\": \"%s\", \"fps\": %.1f, \"max_err_px\": %.4f}\n",
                name, fps, worst);
    return 0;
}

}  // namespace

int main(int argc, char** argv) {
    const char* mode = argc > 1 ? argv[1] : "esm_ncc";
    std::vector<float> img;
    make_scene(img);
    if (!std::strcmp(mode, "esm_ncc"))
        return run<EsmNcc>(img.data(), 3.0, "esm_ncc");
    if (!std::strcmp(mode, "rklt"))
        return run<Rklt>(img.data(), 3.0, "rklt");
    std::fprintf(stderr, "unknown mode %s\n", mode);
    return 2;
}
