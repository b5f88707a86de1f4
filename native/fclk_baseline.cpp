// Single-core CPU reference denominator: FCLK + SSD + 8-DOF homography.
//
// The reference library (abhineet123/MTF) cannot be built in this image
// (no Boost/Eigen), so this file implements its exact hot loop natively
// to produce an honest "reference-grade optimized C++" frames/s number:
//   /root/reference/SM/src/NT/FCLK.cc:171-358  per-iteration structure
//     bilinear gather -> SSD residual -> chained pixel Jacobian ->
//     8x8 normal-equation solve -> compositional update
//   /root/reference/SSM/src/Homography.cc:231-280  cmptWarpedPixJacobian
//     (spatial 2x2 chain (a00 - a20*wx)/D etc. applied to the image
//      gradient before the 2x8 incremental-warp basis at the template pt)
//   /root/reference/SSM/src/Homography.cc:73-92   compositionalUpdate
//     (curr_warp = curr_warp * dW, renormalized by (2,2))
//
// Config matches the chip benchmark: 50x50 patch (parameters.h:153),
// 10 iterations/frame, no early epsilon break.  Single thread (the
// reference hot loop is single-threaded; TBB off by default and
// "has not shown significant performance improvements", ReadMe.md:128).
//
// Two gradient modes are timed and the FASTER one is reported, so the
// denominator is deliberately generous to the reference:
//   fd:       central-difference gradient via 4 extra bilinear samples
//             (imgUtils::getImgGrad semantics — what the reference runs)
//   analytic: exact bilinear-surface gradient reusing the same 4 fetched
//             pixels (a strictly faster rewrite of the same math)
//
// Build: make -C native fclk_baseline   Run: ./native/fclk_baseline
// Output: one JSON line {"fps": ..., "fps_fd": ..., "fps_analytic": ...}

#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <chrono>
#include <vector>

namespace {

constexpr int W = 640, H = 480;
constexpr int RES = 50;              // 50x50 template points
constexpr int N = RES * RES;
constexpr int ITERS = 10;            // max_iters, epsilon = 0
constexpr int SP = 8;                // homography DOF

// xorshift RNG (deterministic scene, no libc rand variance)
uint64_t rng_state = 0x9E3779B97F4A7C15ull;
inline double frand() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return (double)(rng_state >> 11) * (1.0 / 9007199254740992.0);
}

// smooth random scene: double cumulative sum of white noise, like the
// python benchmark's _scene (bench.py)
void make_scene(std::vector<float>& img) {
    std::vector<double> acc((size_t)W * H);
    for (size_t i = 0; i < acc.size(); ++i) acc[i] = frand() - 0.5;
    for (int y = 0; y < H; ++y)          // cumsum rows
        for (int x = 1; x < W; ++x) acc[(size_t)y * W + x] += acc[(size_t)y * W + x - 1];
    for (int y = 1; y < H; ++y)          // cumsum cols
        for (int x = 0; x < W; ++x) acc[(size_t)y * W + x] += acc[(size_t)(y - 1) * W + x];
    double mn = 1e30, mx = -1e30;
    for (double v : acc) { if (v < mn) mn = v; if (v > mx) mx = v; }
    img.resize(acc.size());
    for (size_t i = 0; i < acc.size(); ++i)
        img[i] = (float)((acc[i] - mn) / (mx - mn) * 255.0);
}

inline float bilin(const float* img, double x, double y) {
    // border replicate (imgUtils BorderType::Replicate default)
    if (x < 0) x = 0; if (x > W - 1.001) x = W - 1.001;
    if (y < 0) y = 0; if (y > H - 1.001) y = H - 1.001;
    int x0 = (int)x, y0 = (int)y;
    double fx = x - x0, fy = y - y0;
    const float* p = img + (size_t)y0 * W + x0;
    double i00 = p[0], i01 = p[1], i10 = p[W], i11 = p[W + 1];
    return (float)((i00 * (1 - fx) + i01 * fx) * (1 - fy) +
                   (i10 * (1 - fx) + i11 * fx) * fy);
}

inline void bilin_vg(const float* img, double x, double y,
                     double& val, double& gx, double& gy) {
    // value + analytic gradient of the bilinear surface, same 4 pixels
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

// 8x8 symmetric positive-definite solve: in-place Cholesky
void solve8(double A[SP][SP], double b[SP], double x[SP]) {
    double L[SP][SP];
    for (int i = 0; i < SP; ++i)
        for (int j = 0; j <= i; ++j) {
            double s = A[i][j];
            for (int k = 0; k < j; ++k) s -= L[i][k] * L[j][k];
            L[i][j] = (i == j) ? std::sqrt(s > 1e-12 ? s : 1e-12) : s / L[j][j];
        }
    double y[SP];
    for (int i = 0; i < SP; ++i) {
        double s = b[i];
        for (int k = 0; k < i; ++k) s -= L[i][k] * y[k];
        y[i] = s / L[i][i];
    }
    for (int i = SP - 1; i >= 0; --i) {
        double s = y[i];
        for (int k = i + 1; k < SP; ++k) s -= L[k][i] * x[k];
        x[i] = s / L[i][i];
    }
}

struct Tracker {
    double warp[3][3];               // template coords -> image coords
    double tx[N], ty[N];             // template grid points
    float I0[N];                     // template pixel values

    void init(const float* img, double cx, double cy, double half) {
        int k = 0;
        for (int r = 0; r < RES; ++r)
            for (int c = 0; c < RES; ++c, ++k) {
                tx[k] = -0.5 + (double)c / (RES - 1);
                ty[k] = -0.5 + (double)r / (RES - 1);
            }
        double w0[3][3] = {{2 * half, 0, cx}, {0, 2 * half, cy}, {0, 0, 1}};
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j) warp[i][j] = w0[i][j];
        for (int i = 0; i < N; ++i) {
            double u = warp[0][0] * tx[i] + warp[0][1] * ty[i] + warp[0][2];
            double v = warp[1][0] * tx[i] + warp[1][1] * ty[i] + warp[1][2];
            I0[i] = bilin(img, u, v);
        }
    }

    // one FCLK update: ITERS Gauss-Newton iterations
    // (FCLK.cc:187-341 without the LM branch — leven_marq off by default)
    template <bool ANALYTIC>
    void update(const float* img, int iters = ITERS) {
        for (int it = 0; it < iters; ++it) {
            double Hm[SP][SP] = {}, g[SP] = {};
            const double a00 = warp[0][0], a01 = warp[0][1], a02 = warp[0][2];
            const double a10 = warp[1][0], a11 = warp[1][1], a12 = warp[1][2];
            const double a20 = warp[2][0], a21 = warp[2][1], a22 = warp[2][2];
            for (int i = 0; i < N; ++i) {
                const double x = tx[i], y = ty[i];
                const double D = a20 * x + a21 * y + a22;
                const double invD = 1.0 / D;
                const double wx = (a00 * x + a01 * y + a02) * invD;
                const double wy = (a10 * x + a11 * y + a12) * invD;
                double It, gx, gy;
                if (ANALYTIC) {
                    bilin_vg(img, wx, wy, It, gx, gy);
                } else {
                    // imgUtils::getImgGrad: central differences of
                    // bilinear samples, unit pixel spacing
                    It = bilin(img, wx, wy);
                    gx = 0.5 * (bilin(img, wx + 1, wy) - bilin(img, wx - 1, wy));
                    gy = 0.5 * (bilin(img, wx, wy + 1) - bilin(img, wx, wy - 1));
                }
                const double r = (double)It - (double)I0[i];
                // chained spatial 2x2 (Homography.cc:235-255)
                const double Gx = (gx * (a00 - a20 * wx) + gy * (a10 - a20 * wy)) * invD;
                const double Gy = (gx * (a01 - a21 * wx) + gy * (a11 - a21 * wy)) * invD;
                const double q = Gx * x + Gy * y;
                const double J[SP] = {Gx * x, Gx * y, Gx,
                                      Gy * x, Gy * y, Gy,
                                      -q * x, -q * y};
                for (int a = 0; a < SP; ++a) {
                    g[a] += J[a] * r;
                    for (int b = 0; b <= a; ++b) Hm[a][b] += J[a] * J[b];
                }
            }
            for (int a = 0; a < SP; ++a)
                for (int b = a + 1; b < SP; ++b) Hm[a][b] = Hm[b][a];
            double dp[SP];
            solve8(Hm, g, dp);
            // compositionalUpdate (Homography.cc:73-92): W <- W*dW, /= (2,2)
            const double dW[3][3] = {{1 + dp[0] * -1, dp[1] * -1, dp[2] * -1},
                                     {dp[3] * -1, 1 + dp[4] * -1, dp[5] * -1},
                                     {dp[6] * -1, dp[7] * -1, 1}};
            double nw[3][3];
            for (int r2 = 0; r2 < 3; ++r2)
                for (int c = 0; c < 3; ++c)
                    nw[r2][c] = warp[r2][0] * dW[0][c] + warp[r2][1] * dW[1][c] +
                                warp[r2][2] * dW[2][c];
            const double inv22 = 1.0 / nw[2][2];
            for (int r2 = 0; r2 < 3; ++r2)
                for (int c = 0; c < 3; ++c) warp[r2][c] = nw[r2][c] * inv22;
        }
    }
};

template <bool ANALYTIC>
double measure(const float* img) {
    Tracker trk;
    trk.init(img, 320.0, 240.0, 50.0);
    const int WARMUP = 20, STEPS = 200;
    double base[3][3];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) base[i][j] = trk.warp[i][j];
    auto jitter = [&]() {
        // perturb the converged warp so every update does real work
        // (equivalent of inter-frame motion; same per-update FLOPs as
        // tracking a moving sequence since iterations never early-break)
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j) trk.warp[i][j] = base[i][j];
        trk.warp[0][2] += (frand() - 0.5) * 4.0;
        trk.warp[1][2] += (frand() - 0.5) * 4.0;
        trk.warp[0][0] *= 1.0 + (frand() - 0.5) * 0.02;
        trk.warp[1][1] *= 1.0 + (frand() - 0.5) * 0.02;
    };
    for (int s = 0; s < WARMUP; ++s) { jitter(); trk.update<ANALYTIC>(img); }
    auto t0 = std::chrono::steady_clock::now();
    for (int s = 0; s < STEPS; ++s) { jitter(); trk.update<ANALYTIC>(img); }
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    return STEPS / dt;
}

}  // namespace

// convergence self-check: jittered warps must be recovered to sub-pixel
// corner error, otherwise the timed loop is burning FLOPs without tracking
double verify(const float* img) {
    Tracker trk;
    trk.init(img, 320.0, 240.0, 50.0);
    double base[3][3];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) base[i][j] = trk.warp[i][j];
    const char* dbg = std::getenv("FCLK_DEBUG_ITERS");
    int iters = dbg ? std::atoi(dbg) : ITERS;
    double worst = 0;
    int ok = 0;
    for (int s = 0; s < 10; ++s) {
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j) trk.warp[i][j] = base[i][j];
        // jitter within the LK convergence basin (the 50x50 grid samples
        // the 100px patch every 2px; larger displacements can alias into
        // local minima — a property of the algorithm, not this impl)
        trk.warp[0][2] += (frand() - 0.5) * 3.0;
        trk.warp[1][2] += (frand() - 0.5) * 3.0;
        trk.update<true>(img, iters);
        double trial_worst = 0;
        const double cs[4][2] = {{-.5, -.5}, {.5, -.5}, {.5, .5}, {-.5, .5}};
        for (auto& c : cs) {
            double d0 = base[2][0] * c[0] + base[2][1] * c[1] + base[2][2];
            double u0 = (base[0][0] * c[0] + base[0][1] * c[1] + base[0][2]) / d0;
            double v0 = (base[1][0] * c[0] + base[1][1] * c[1] + base[1][2]) / d0;
            double d1 = trk.warp[2][0] * c[0] + trk.warp[2][1] * c[1] + trk.warp[2][2];
            double u1 = (trk.warp[0][0] * c[0] + trk.warp[0][1] * c[1] + trk.warp[0][2]) / d1;
            double v1 = (trk.warp[1][0] * c[0] + trk.warp[1][1] * c[1] + trk.warp[1][2]) / d1;
            double e = std::sqrt((u1 - u0) * (u1 - u0) + (v1 - v0) * (v1 - v0));
            if (e > worst) worst = e;
            if (e > trial_worst) trial_worst = e;
            if (dbg) std::fprintf(stderr, "trial %d err %.4f\n", s, e);
        }
        // pure GN (no damping, like the reference default) can stall at
        // a spurious stationary point on a weakly-textured random patch;
        // require 9/10 trials to converge sub-0.1px
        if (trial_worst < 0.1) ++ok;
    }
    return ok >= 9 ? worst : 1e9;
}

int main() {
    std::vector<float> img;
    make_scene(img);
    double err = verify(img.data());
    double fps_fd = measure<false>(img.data());
    double fps_an = measure<true>(img.data());
    double fps = fps_fd > fps_an ? fps_fd : fps_an;
    std::printf("{\"fps\": %.1f, \"fps_fd\": %.1f, \"fps_analytic\": %.1f, "
                "\"max_err_px\": %.4f}\n", fps, fps_fd, fps_an, err);
    return err < 1e9 ? 0 : 1;
}
