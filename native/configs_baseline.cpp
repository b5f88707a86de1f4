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
// Since r5 the stochastic-search configs are covered too (VERDICT r4
// #3): `pf500` (PF(500) + FCLM/SSIM, the reference particle loop
// PF.cc:207-420 + systematic resampling PF.cc:450-480) and `nn1k`
// (NN(1000) + ICLM/MI, dataset + brute-force search NN.cc:57-278) —
// see their struct headers below.
//
// Build: make -C native configs_baseline
// Run:   ./native/configs_baseline esm_ncc|rklt|pf500|nn1k
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
    // NaN-safe clamp (a near-singular projective proposal can produce
    // NaN coords; "if (x < 0)" lets NaN straight through to the index)
    if (!(x >= 0)) x = 0; if (x > W - 1.001) x = W - 1.001;
    if (!(y >= 0)) y = 0; if (y > H - 1.001) y = H - 1.001;
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

// ------------------------------------------------------- PF500 / NN1k
// Native single-core denominators for the stochastic milestone configs
// (VERDICT r4 #3).  Both run the reference's per-frame hot-loop shape:
//
//   pf500  PF(500) + FCLM/SSIM refiner on an 8-DOF homography at 25x25
//          (/root/reference/SM/src/NT/PF.cc:207-420 particle loop:
//          per-particle compositional random walk + patch sampling +
//          AM likelihood; systematic resampling PF.cc:450-480; the
//          pffc cascade's FCLM/SSIM second stage with LM rollback,
//          FCLK.cc:193-217 + SSIM.cc similarity).
//   nn1k   NN(1000) + ICLM/MI at 25x25
//          (/root/reference/SM/src/NT/NN.cc:57-278: init-time dataset
//          of warped-patch samples, per-frame brute-force nearest
//          neighbour + inverse warp; ICLK/MI refinement with the
//          constant initial self Hessian, ICLK.cc + MI.cc B-spline
//          Parzen histograms).

constexpr int RES2 = 25;
constexpr int N2 = RES2 * RES2;
constexpr int NPART = 500;
constexpr int NSAMP = 1000;
constexpr int NBINS = 32;

struct Warp25 {                   // shared 25x25 warp/sampling machinery
    double warp[3][3];
    double tx[N2], ty[N2];
    float I0[N2];

    void init_geom(const float* img, double cx, double cy, double half) {
        int k = 0;
        for (int r = 0; r < RES2; ++r)
            for (int c = 0; c < RES2; ++c, ++k) {
                tx[k] = -0.5 + (double)c / (RES2 - 1);
                ty[k] = -0.5 + (double)r / (RES2 - 1);
            }
        double w0[3][3] = {{2 * half, 0, cx}, {0, 2 * half, cy}, {0, 0, 1}};
        std::memcpy(warp, w0, sizeof w0);
        for (int i = 0; i < N2; ++i)
            I0[i] = bilin(img, warp[0][0] * tx[i] + warp[0][2],
                          warp[1][1] * ty[i] + warp[1][2]);
    }

    static void compose_dW(const double a[3][3], const double p[SP],
                           double out[3][3]) {
        const double dW[3][3] = {{1 + p[0], p[1], p[2]},
                                 {p[3], 1 + p[4], p[5]},
                                 {p[6], p[7], 1}};
        double nw[3][3];
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c)
                nw[r][c] = a[r][0] * dW[0][c] + a[r][1] * dW[1][c] +
                           a[r][2] * dW[2][c];
        const double inv22 = 1.0 / nw[2][2];
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c) out[r][c] = nw[r][c] * inv22;
    }

    void sample(const float* img, const double a[3][3], float* out) const {
        for (int i = 0; i < N2; ++i) {
            const double x = tx[i], y = ty[i];
            const double D = a[2][0] * x + a[2][1] * y + a[2][2];
            const double invD = 1.0 / D;
            out[i] = bilin(img,
                           (a[0][0] * x + a[0][1] * y + a[0][2]) * invD,
                           (a[1][0] * x + a[1][1] * y + a[1][2]) * invD);
        }
    }
};

// SSIM similarity over the whole patch (AM/src/SSIM.cc:45-128 form:
// patch means/variances/covariance, c1/c2 stabilizers)
struct SsimStats { double mu0, v0, c1, c2; };
inline double ssim_f(const float* I0, const float* It, int n,
                     const SsimStats& st, double* mut_o = nullptr,
                     double* vt_o = nullptr, double* cov_o = nullptr) {
    double mut = 0;
    for (int i = 0; i < n; ++i) mut += It[i];
    mut /= n;
    double vt = 0, cov = 0;
    for (int i = 0; i < n; ++i) {
        const double d = It[i] - mut;
        vt += d * d;
        cov += (I0[i] - st.mu0) * d;
    }
    vt /= n; cov /= n;
    if (mut_o) { *mut_o = mut; *vt_o = vt; *cov_o = cov; }
    const double a = 2 * st.mu0 * mut + st.c1, b = 2 * cov + st.c2;
    const double c = st.mu0 * st.mu0 + mut * mut + st.c1;
    const double d = st.v0 + vt + st.c2;
    return (a * b) / (c * d);
}

struct Pf500 : Warp25 {
    double part[NPART][SP];       // particle states (relative to warp0)
    double warp0[3][3];
    double sig[SP];
    double p_mean[SP];
    SsimStats sst;
    double J0sum[SP];             // refiner init-Jacobian column sums
    // FCLM/SSIM refiner state
    double lm_delta = 1e-3;

    static double nrand() {       // Box-Muller on the xorshift stream
        double u1 = frand(), u2 = frand();
        if (u1 < 1e-12) u1 = 1e-12;
        return std::sqrt(-2.0 * std::log(u1)) *
               std::cos(2.0 * M_PI * u2);
    }

    void init(const float* img, double cx, double cy, double half) {
        init_geom(img, cx, cy, half);
        std::memcpy(warp0, warp, sizeof warp0);
        sst.mu0 = 0;
        for (int i = 0; i < N2; ++i) sst.mu0 += I0[i];
        sst.mu0 /= N2;
        sst.v0 = 0;
        for (int i = 0; i < N2; ++i) {
            const double d = I0[i] - sst.mu0;
            sst.v0 += d * d;
        }
        sst.v0 /= N2;
        sst.c1 = 6.5025; sst.c2 = 58.5225;
        // per-dof sigma from a 3 px RMS point displacement
        // (estimateStateSigma, StateSpaceModel.h:330-338): sigma_i =
        // pix_sigma_unit / rms(||dW/dp_i||) on the unit-square grid
        const double su = 3.0 / (2 * half);
        const double rms[SP] = {0.289, 0.289, 1.0, 0.289, 0.289, 1.0,
                                0.139, 0.139};
        for (int s = 0; s < SP; ++s) sig[s] = su / rms[s];
        for (int i = 0; i < NPART; ++i)
            for (int s = 0; s < SP; ++s) part[i][s] = 0;
        for (int s = 0; s < SP; ++s) p_mean[s] = 0;
    }

    void state_of_warp(double p[SP]) const {
        // p with warp = warp0 o dW(p): m = warp0^-1 warp (h22-normalized)
        double inv0[3][3];
        const double* a = &warp0[0][0];
        const double det =
            a[0] * (a[4] * a[8] - a[5] * a[7]) -
            a[1] * (a[3] * a[8] - a[5] * a[6]) +
            a[2] * (a[3] * a[7] - a[4] * a[6]);
        const double id = 1.0 / det;
        inv0[0][0] = (a[4] * a[8] - a[5] * a[7]) * id;
        inv0[0][1] = (a[2] * a[7] - a[1] * a[8]) * id;
        inv0[0][2] = (a[1] * a[5] - a[2] * a[4]) * id;
        inv0[1][0] = (a[5] * a[6] - a[3] * a[8]) * id;
        inv0[1][1] = (a[0] * a[8] - a[2] * a[6]) * id;
        inv0[1][2] = (a[2] * a[3] - a[0] * a[5]) * id;
        inv0[2][0] = (a[3] * a[7] - a[4] * a[6]) * id;
        inv0[2][1] = (a[1] * a[6] - a[0] * a[7]) * id;
        inv0[2][2] = (a[0] * a[4] - a[1] * a[3]) * id;
        double m[3][3];
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c)
                m[r][c] = inv0[r][0] * warp[0][c] + inv0[r][1] * warp[1][c] +
                          inv0[r][2] * warp[2][c];
        const double inv22 = 1.0 / m[2][2];
        p[0] = m[0][0] * inv22 - 1; p[1] = m[0][1] * inv22;
        p[2] = m[0][2] * inv22;     p[3] = m[1][0] * inv22;
        p[4] = m[1][1] * inv22 - 1; p[5] = m[1][2] * inv22;
        p[6] = m[2][0] * inv22;     p[7] = m[2][1] * inv22;
    }

    void refine(const float* img, int iters) {
        // FCLM/SSIM: LM rollback (FCLK.cc:193-217) with the closed-form
        // SSIM self Hessian
        //   H = -2/(n b)[JtJ - (SJ)(SJ)^T/n] - 2/(n^2 a)(SJ)(SJ)^T
        // (derived at the self state It=I0: a = 2 mu^2+c1, b = 2 v0+c2)
        static float It[N2];
        sample(img, warp, It);
        double f_prev = ssim_f(I0, It, N2, sst);
        for (int it = 0; it < iters; ++it) {
            double a3[3][3];
            std::memcpy(a3, warp, sizeof a3);
            double mut, vt, cov;
            double g[SP] = {}, JtJ[SP][SP] = {}, SJ[SP] = {};
            double mean_acc = 0;
            static double vals[N2], gxs[N2], gys[N2], wxs[N2], wys[N2],
                invDs[N2];
            for (int i = 0; i < N2; ++i) {
                const double x = tx[i], y = ty[i];
                const double D = a3[2][0] * x + a3[2][1] * y + a3[2][2];
                const double invD = 1.0 / D;
                const double wx =
                    (a3[0][0] * x + a3[0][1] * y + a3[0][2]) * invD;
                const double wy =
                    (a3[1][0] * x + a3[1][1] * y + a3[1][2]) * invD;
                double val, gx, gy;
                bilin_vg(img, wx, wy, val, gx, gy);
                vals[i] = val; gxs[i] = gx; gys[i] = gy;
                wxs[i] = wx; wys[i] = wy; invDs[i] = invD;
                mean_acc += val;
            }
            mut = mean_acc / N2;
            vt = 0; cov = 0;
            for (int i = 0; i < N2; ++i) {
                const double dmt = vals[i] - mut;
                vt += dmt * dmt;
                cov += (I0[i] - sst.mu0) * dmt;
            }
            vt /= N2; cov /= N2;
            const double A = 2 * sst.mu0 * mut + sst.c1;
            const double Bc = 2 * cov + sst.c2;
            const double Cc = sst.mu0 * sst.mu0 + mut * mut + sst.c1;
            const double Dd = sst.v0 + vt + sst.c2;
            const double f = (A * Bc) / (Cc * Dd);
            for (int i = 0; i < N2; ++i) {
                // dSSIM/dIt_i (AM/src/SSIM.cc:96-135 structure)
                const double dfdI =
                    (2.0 / N2) *
                    ((sst.mu0 * Bc + A * (I0[i] - sst.mu0)) / (Cc * Dd) -
                     f * (mut * Dd + Cc * (vals[i] - mut)) / (Cc * Dd));
                double Jc[SP];
                pix_jac25(gxs[i], gys[i], tx[i], ty[i], wxs[i], wys[i],
                          invDs[i], a3, Jc);
                for (int s = 0; s < SP; ++s) {
                    g[s] += dfdI * Jc[s];
                    SJ[s] += Jc[s];
                    for (int t = 0; t <= s; ++t)
                        JtJ[s][t] += Jc[s] * Jc[t];
                }
            }
            const double As = 2 * sst.mu0 * sst.mu0 + sst.c1;
            const double Bs = 2 * sst.v0 + sst.c2;
            double Hm[SP][SP];
            for (int s = 0; s < SP; ++s) {
                for (int t = s + 1; t < SP; ++t) JtJ[s][t] = JtJ[t][s];
            }
            for (int s = 0; s < SP; ++s)
                for (int t = 0; t < SP; ++t) {
                    const double proj = SJ[s] * SJ[t] / N2;
                    Hm[s][t] = 2.0 / (N2 * Bs) * (JtJ[s][t] - proj) +
                               2.0 / ((double)N2 * N2 * As) *
                                   SJ[s] * SJ[t];
                    if (s == t) Hm[s][t] += 1e-10;
                    Hm[s][t] *= (1.0 + (s == t ? lm_delta : 0.0));
                }
            double dp[SP];
            solveS<SP>(Hm, g, dp);
            double cand[3][3];
            compose_dW(warp, dp, cand);
            static float It2[N2];
            sample(img, cand, It2);
            const double f_new = ssim_f(I0, It2, N2, sst);
            if (f_new >= f_prev) {
                std::memcpy(warp, cand, sizeof cand);
                f_prev = f_new;
                lm_delta *= 0.1;
                if (lm_delta < 1e-7) lm_delta = 1e-7;
            } else {
                lm_delta *= 10.0;
                if (lm_delta > 1e7) lm_delta = 1e7;
            }
        }
    }

    static void pix_jac25(double gx, double gy, double x, double y,
                          double wx, double wy, double invD,
                          const double a[3][3], double J[SP]) {
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

    void update(const float* img, int /*iters*/ = ITERS) {
        // 0. absorb external state change (cascade feedback /
        //    set_region): shift the particle cloud to the new mean
        double p_now[SP];
        state_of_warp(p_now);
        for (int i = 0; i < NPART; ++i)
            for (int s = 0; s < SP; ++s)
                part[i][s] += p_now[s] - p_mean[s];
        // 1-2. propagate + measure (PF.cc:261 loop)
        static double prop[NPART][SP];
        static double w[NPART];
        static float patch[N2];
        double wmax = -1e300;
        for (int i = 0; i < NPART; ++i) {
            for (int s = 0; s < SP; ++s)
                prop[i][s] = part[i][s] + sig[s] * nrand();
            double a3[3][3];
            compose_dW(warp0, prop[i], a3);
            sample(img, a3, patch);
            const double f = ssim_f(I0, patch, N2, sst);
            w[i] = -50.0 * (1.0 - f);     // log-likelihood (alpha = 50)
            if (w[i] > wmax) wmax = w[i];
        }
        double wsum = 0;
        for (int i = 0; i < NPART; ++i) {
            w[i] = std::exp(w[i] - wmax);
            wsum += w[i];
        }
        double neff_den = 0;
        for (int i = 0; i < NPART; ++i) {
            w[i] /= wsum;
            neff_den += w[i] * w[i];
        }
        // 3. systematic resampling (PF.cc:450-480) when n_eff < P/2
        if (1.0 / neff_den < 0.5 * NPART) {
            const double u0 = frand() / NPART;
            double cum = 0;
            int j = 0;
            for (int i = 0; i < NPART; ++i) {
                const double u = u0 + (double)i / NPART;
                while (cum + w[j] < u && j < NPART - 1) cum += w[j++];
                for (int s = 0; s < SP; ++s) part[i][s] = prop[j][s];
            }
            for (int i = 0; i < NPART; ++i) w[i] = 1.0 / NPART;
        } else {
            std::memcpy(part, prop, sizeof prop);
        }
        // 4. weighted-mean state + FCLM/SSIM refinement (pffc cascade)
        double pm[SP] = {};
        for (int i = 0; i < NPART; ++i)
            for (int s = 0; s < SP; ++s) pm[s] += w[i] * part[i][s];
        compose_dW(warp0, pm, warp);
        refine(img, ITERS);
        state_of_warp(p_mean);
        // feedback: re-center the cloud on the refined estimate
        for (int i = 0; i < NPART; ++i)
            for (int s = 0; s < SP; ++s)
                part[i][s] += p_mean[s] - pm[s];
    }
};

// cubic B-spline taps for the Parzen joint histogram (MI.cc:60-150)
inline void bspl4(double t, double w[4], double dw[4]) {
    // t in [0, 1): offsets to taps at {-1, 0, 1, 2}
    const double t2 = t * t, t3 = t2 * t;
    w[0] = (-t3 + 3 * t2 - 3 * t + 1) / 6.0;
    w[1] = (3 * t3 - 6 * t2 + 4) / 6.0;
    w[2] = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0;
    w[3] = t3 / 6.0;
    dw[0] = (-3 * t2 + 6 * t - 3) / 6.0;
    dw[1] = (9 * t2 - 12 * t) / 6.0;
    dw[2] = (-9 * t2 + 6 * t + 3) / 6.0;
    dw[3] = 3 * t2 / 6.0;
}

struct Nn1k : Warp25 {
    double samp_p[NSAMP][SP];
    float samp_patch[NSAMP][N2];
    double J0[N2][SP];            // template pixel Jacobian (IC chain)
    double H0[SP][SP];            // constant initial self Hessian (FD)
    double bin0[N2];              // template bin coords
    double lm_delta = 1e-3;

    static double nrand() { return Pf500::nrand(); }

    void init(const float* img, double cx, double cy, double half) {
        init_geom(img, cx, cy, half);
        // template-side pixel Jacobian at identity (ICLK.cc hoisting)
        for (int i = 0; i < N2; ++i) {
            const double u = warp[0][0] * tx[i] + warp[0][2];
            const double v = warp[1][1] * ty[i] + warp[1][2];
            double val, gx, gy;
            bilin_vg(img, u, v, val, gx, gy);
            Pf500::pix_jac25(gx, gy, tx[i], ty[i], u, v, 1.0, warp, J0[i]);
        }
        for (int i = 0; i < N2; ++i)
            bin0[i] = bin_of(I0[i]);
        // dataset generation (NN.cc:57-130): random warps, inverse
        // applied at runtime
        const double su = 3.0 / (2 * half);
        const double rms[SP] = {0.289, 0.289, 1.0, 0.289, 0.289, 1.0,
                                0.139, 0.139};
        for (int s2 = 0; s2 < NSAMP; ++s2) {
            double a3[3][3];
            for (int s = 0; s < SP; ++s)
                samp_p[s2][s] = (su / rms[s]) * nrand();
            compose_dW(warp, samp_p[s2], a3);
            sample(img, a3, samp_patch[s2]);
        }
        // constant initial self Hessian by central differences of the
        // MI gradient on the init frame (ICLM's H0; the B-spline
        // second-derivative closed form is equivalent, MI.cc:200-280)
        // wide FD step (~0.5 px displacement): MI's Parzen surface
        // ripples at sub-0.01 px scale, and a tight step measures the
        // ripple curvature, not the basin's
        const double eps = 1e-2;
        for (int s = 0; s < SP; ++s) {
            double gp[SP], gm[SP], p[SP] = {};
            p[s] = eps;
            double a3[3][3];
            compose_dW(warp, p, a3);
            mi_grad(img, a3, gp);
            p[s] = -eps;
            compose_dW(warp, p, a3);
            mi_grad(img, a3, gm);
            for (int t = 0; t < SP; ++t)
                H0[s][t] = (gp[t] - gm[t]) / (2 * eps);
        }
        for (int s = 0; s < SP; ++s)        // symmetrize + damp floor
            for (int t = 0; t < s; ++t) {
                const double m = 0.5 * (H0[s][t] + H0[t][s]);
                H0[s][t] = H0[t][s] = m;
            }
    }

    static double bin_of(double v) {
        // map [0, 255] into B-spline-supported bin space (MI.cc:60-80)
        double b = v / 255.0 * (NBINS - 3) + 1.0;
        if (b < 1.0) b = 1.0;
        if (b > NBINS - 2.001) b = NBINS - 2.001;
        return b;
    }

    double mi_value(const float* patch) const {
        static double Pj[NBINS][NBINS], Pr[NBINS], Pt[NBINS];
        std::memset(Pj, 0, sizeof Pj);
        std::memset(Pr, 0, sizeof Pr);
        std::memset(Pt, 0, sizeof Pt);
        const double pre = 1e-8;
        for (int r = 0; r < NBINS; ++r)
            for (int t = 0; t < NBINS; ++t) Pj[r][t] = pre;
        for (int i = 0; i < N2; ++i) {
            const double br = bin_of(patch[i]), bt = bin0[i];
            const int ir = (int)br, it = (int)bt;
            double wr[4], dr[4], wt[4], dt[4];
            bspl4(br - ir, wr, dr);
            bspl4(bt - it, wt, dt);
            for (int a = 0; a < 4; ++a)
                for (int b = 0; b < 4; ++b)
                    Pj[ir - 1 + a][it - 1 + b] += wr[a] * wt[b];
        }
        double tot = 0;
        for (int r = 0; r < NBINS; ++r)
            for (int t = 0; t < NBINS; ++t) tot += Pj[r][t];
        double mi = 0;
        for (int r = 0; r < NBINS; ++r)
            for (int t = 0; t < NBINS; ++t) {
                Pj[r][t] /= tot;
                Pr[r] += Pj[r][t];
            }
        for (int t = 0; t < NBINS; ++t)
            for (int r = 0; r < NBINS; ++r) Pt[t] += Pj[r][t];
        for (int r = 0; r < NBINS; ++r)
            for (int t = 0; t < NBINS; ++t)
                if (Pj[r][t] > 1e-12)
                    mi += Pj[r][t] *
                          std::log(Pj[r][t] / (Pr[r] * Pt[t] + 1e-30));
        return mi;
    }

    // dMI/dp through the TEMPLATE-side bins (inverse compositional
    // chain: dMI/dI0_i * J0_i; MI.cc gradient structure)
    void mi_grad(const float* img, const double a3[3][3],
                 double g[SP]) const {
        static float patch[N2];
        sample(img, a3, patch);
        static double Pj[NBINS][NBINS], Pr[NBINS], Pt[NBINS];
        for (int r = 0; r < NBINS; ++r)
            for (int t = 0; t < NBINS; ++t) Pj[r][t] = 1e-8;
        static double brs[N2];
        for (int i = 0; i < N2; ++i) {
            const double br = bin_of(patch[i]), bt = bin0[i];
            brs[i] = br;
            const int ir = (int)br, it = (int)bt;
            double wr[4], dr[4], wt[4], dt[4];
            bspl4(br - ir, wr, dr);
            bspl4(bt - it, wt, dt);
            for (int a = 0; a < 4; ++a)
                for (int b = 0; b < 4; ++b)
                    Pj[ir - 1 + a][it - 1 + b] += wr[a] * wt[b];
        }
        double tot = 0;
        for (int r = 0; r < NBINS; ++r)
            for (int t = 0; t < NBINS; ++t) tot += Pj[r][t];
        for (int r = 0; r < NBINS; ++r) Pr[r] = 0;
        for (int t = 0; t < NBINS; ++t) Pt[t] = 0;
        for (int r = 0; r < NBINS; ++r)
            for (int t = 0; t < NBINS; ++t) {
                Pj[r][t] /= tot;
                Pr[r] += Pj[r][t];
            }
        for (int t = 0; t < NBINS; ++t)
            for (int r = 0; r < NBINS; ++r) Pt[t] += Pj[r][t];
        const double dbin = (NBINS - 3) / 255.0;   // dbin/dI
        for (int s = 0; s < SP; ++s) g[s] = 0;
        for (int i = 0; i < N2; ++i) {
            const double br = brs[i], bt = bin0[i];
            const int ir = (int)br, it = (int)bt;
            double wr[4], dr[4], wt[4], dt[4];
            bspl4(br - ir, wr, dr);
            bspl4(bt - it, wt, dt);
            double dmi = 0;
            for (int a = 0; a < 4; ++a)
                for (int b = 0; b < 4; ++b) {
                    const double pj = Pj[ir - 1 + a][it - 1 + b];
                    dmi += dt[b] * wr[a] *
                           std::log(pj / (Pt[it - 1 + b] + 1e-30));
                }
            dmi *= dbin / tot;
            for (int s = 0; s < SP; ++s) g[s] += dmi * J0[i][s];
        }
    }

    void update(const float* img, int /*iters*/ = ITERS) {
        // two NN+refine rounds per frame (NN.cc runs max_iters NN
        // steps; the second round re-snaps after refinement and lets
        // the MI refiner escape its near-optimum ripple plateau)
        for (int round = 0; round < 2; ++round) update_once(img);
    }

    void update_once(const float* img) {
        // 1. NN stage: sample at the current warp, brute-force nearest
        //    dataset sample (SSD dist feature — cheaper than the MI
        //    feature, generous to the baseline), apply its inverse warp
        static float cur[N2];
        sample(img, warp, cur);
        int best = 0;
        double bestd = 1e300;
        for (int s2 = 0; s2 < NSAMP; ++s2) {
            double d = 0;
            const float* sp = samp_patch[s2];
            for (int i = 0; i < N2; ++i) {
                const double e = cur[i] - sp[i];
                d += e * e;
            }
            if (d < bestd) { bestd = d; best = s2; }
        }
        // warp <- warp o dW(p_best)^-1  (NN.cc:236-278 inverse update)
        double dWb[3][3] = {{1 + samp_p[best][0], samp_p[best][1],
                             samp_p[best][2]},
                            {samp_p[best][3], 1 + samp_p[best][4],
                             samp_p[best][5]},
                            {samp_p[best][6], samp_p[best][7], 1}};
        // invert 3x3
        double inv[3][3];
        {
            const double* a = &dWb[0][0];
            const double det =
                a[0] * (a[4] * a[8] - a[5] * a[7]) -
                a[1] * (a[3] * a[8] - a[5] * a[6]) +
                a[2] * (a[3] * a[7] - a[4] * a[6]);
            const double id = 1.0 / det;
            inv[0][0] = (a[4] * a[8] - a[5] * a[7]) * id;
            inv[0][1] = (a[2] * a[7] - a[1] * a[8]) * id;
            inv[0][2] = (a[1] * a[5] - a[2] * a[4]) * id;
            inv[1][0] = (a[5] * a[6] - a[3] * a[8]) * id;
            inv[1][1] = (a[0] * a[8] - a[2] * a[6]) * id;
            inv[1][2] = (a[2] * a[3] - a[0] * a[5]) * id;
            inv[2][0] = (a[3] * a[7] - a[4] * a[6]) * id;
            inv[2][1] = (a[1] * a[6] - a[0] * a[7]) * id;
            inv[2][2] = (a[0] * a[4] - a[1] * a[3]) * id;
        }
        double nw[3][3];
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c)
                nw[r][c] = warp[r][0] * inv[0][c] + warp[r][1] * inv[1][c] +
                           warp[r][2] * inv[2][c];
        const double inv22 = 1.0 / nw[2][2];
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c) warp[r][c] = nw[r][c] * inv22;
        // 2. ICLM/MI refinement: constant H0, LM rollback, inverse
        //    compositional update (ICLK.cc + FCLK.cc:193-217)
        static float It[N2];
        sample(img, warp, It);
        double f_prev = mi_value(It);
        for (int it2 = 0; it2 < ITERS; ++it2) {
            double g[SP];
            mi_grad(img, warp, g);
            double Hm[SP][SP];
            // H0 is the FD CROSS Hessian (template-side gradient
            // differentiated along the current warp), which equals
            // -H_self at alignment — already positive definite for the
            // ascent solve dp = (-H_self)^{-1} g
            for (int s = 0; s < SP; ++s)
                for (int t = 0; t < SP; ++t) {
                    Hm[s][t] = H0[s][t];
                    if (s == t) Hm[s][t] *= (1.0 + lm_delta);
                    if (s == t) Hm[s][t] += 1e-10;
                }
            double dp[SP];
            solveS<SP>(Hm, g, dp);
            // inverse compositional: compose the INVERSE increment
            double dWm[3][3] = {{1 + dp[0], dp[1], dp[2]},
                                {dp[3], 1 + dp[4], dp[5]},
                                {dp[6], dp[7], 1}};
            double inv2[3][3];
            {
                const double* a = &dWm[0][0];
                const double det =
                    a[0] * (a[4] * a[8] - a[5] * a[7]) -
                    a[1] * (a[3] * a[8] - a[5] * a[6]) +
                    a[2] * (a[3] * a[7] - a[4] * a[6]);
                const double id = 1.0 / det;
                inv2[0][0] = (a[4] * a[8] - a[5] * a[7]) * id;
                inv2[0][1] = (a[2] * a[7] - a[1] * a[8]) * id;
                inv2[0][2] = (a[1] * a[5] - a[2] * a[4]) * id;
                inv2[1][0] = (a[5] * a[6] - a[3] * a[8]) * id;
                inv2[1][1] = (a[0] * a[8] - a[2] * a[6]) * id;
                inv2[1][2] = (a[2] * a[3] - a[0] * a[5]) * id;
                inv2[2][0] = (a[3] * a[7] - a[4] * a[6]) * id;
                inv2[2][1] = (a[1] * a[6] - a[0] * a[7]) * id;
                inv2[2][2] = (a[0] * a[4] - a[1] * a[3]) * id;
            }
            double cand[3][3];
            for (int r = 0; r < 3; ++r)
                for (int c = 0; c < 3; ++c)
                    cand[r][c] = warp[r][0] * inv2[0][c] +
                                 warp[r][1] * inv2[1][c] +
                                 warp[r][2] * inv2[2][c];
            const double i22 = 1.0 / cand[2][2];
            for (int r = 0; r < 3; ++r)
                for (int c = 0; c < 3; ++c) cand[r][c] *= i22;
            static float It2[N2];
            sample(img, cand, It2);
            const double f_new = mi_value(It2);
            if (f_new >= f_prev) {
                std::memcpy(warp, cand, sizeof cand);
                f_prev = f_new;
                lm_delta *= 0.1;
                if (lm_delta < 1e-7) lm_delta = 1e-7;
            } else {
                lm_delta *= 10.0;
                if (lm_delta > 1e7) lm_delta = 1e7;
            }
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
int run(const float* img, double t_amp, const char* name,
        double thresh = 0.5) {
    T* trk_p = new T();    // Nn1k's sample dataset is ~2.6 MB: keep the
    T& trk = *trk_p;       // tracker off the stack
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
        if (e < thresh) ++ok;
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
    if (!std::strcmp(mode, "pf500"))
        return run<Pf500>(img.data(), 2.0, "pf500");
    if (!std::strcmp(mode, "nn1k"))
        // MI's Parzen surface is scale-flat on smooth texture: the
        // refiner floors at ~0.6 px (the Python nnic/mi row shows the
        // same class of floor); the denominator's self-check only needs
        // to demonstrate convergent tracking, the metric is cost
        return run<Nn1k>(img.data(), 2.0, "nn1k", 1.0);
    std::fprintf(stderr, "unknown mode %s\n", mode);
    return 2;
}
