"""WarpingDemo analog: visualize each SSM's warp space.

Reference: `/root/reference/Examples/cpp/WarpingDemo.cc` — perturbs an
SSM's state and shows the warped patch. Here: for every requested SSM,
sample random state perturbations, resample the region under each warp,
and write a contact-sheet PNG per SSM under `log/warping_demo/`.

Run: `python examples/warping_demo.py [image] [--ssms 2,4,6,8,sl3]`
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image", nargs="?",
                   help="source image (synthetic if omitted)")
    p.add_argument("--ssms", default="2,4,6,8,sl3")
    p.add_argument("--n", type=int, default=8, help="samples per SSM")
    p.add_argument("--sigma", type=float, default=0.08)
    p.add_argument("--out_dir", default="log/warping_demo")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mtf_tpu.ops import interp
    from mtf_tpu.ops import warp as W
    from mtf_tpu.sm.core import make_region
    from mtf_tpu.ssm import get_ssm

    if args.image:
        from mtf_tpu.utils.input import load_image
        img = jnp.asarray(load_image(args.image), jnp.float32)
    else:
        rng = np.random.default_rng(0)
        raw = np.cumsum(np.cumsum(rng.normal(0, 1, (240, 320)), 0), 1)
        img = jnp.asarray((raw - raw.min()) / (raw.max() - raw.min())
                          * 255.0, jnp.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w = img.shape[:2]
    s = min(h, w) / 4.0
    corners = jnp.asarray([[w/2 - s, h/2 - s], [w/2 + s, h/2 - s],
                           [w/2 + s, h/2 + s], [w/2 - s, h/2 + s]],
                          jnp.float32)
    res = 96
    region = make_region(corners, res, res)
    os.makedirs(args.out_dir, exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def render(ssm, state):
        pts_t = ssm.warp_pts(state, region.base_pts)
        pts_img = W.apply_warp(region.norm_mat, pts_t)
        patch = interp.sample(img, pts_img, kind="linear")
        return np.asarray(patch[:, 0]).reshape(res, res)

    key = jax.random.PRNGKey(0)
    for name in args.ssms.split(","):
        ssm = get_ssm(name)
        ident = ssm.identity()
        fig, axes = plt.subplots(1, args.n + 1,
                                 figsize=(1.6 * (args.n + 1), 1.9))
        axes[0].imshow(render(ssm, ident), cmap="gray")
        axes[0].set_title("identity", fontsize=7)
        for i in range(args.n):
            key, k = jax.random.split(key)
            dp = args.sigma * jax.random.normal(k, (ssm.dof,))
            st = ssm.compositional_update(ident, dp)
            axes[i + 1].imshow(render(ssm, st), cmap="gray")
            axes[i + 1].set_title(f"#{i}", fontsize=7)
        for ax in axes:
            ax.axis("off")
        fig.suptitle(f"SSM {name} ({ssm.dof} DOF) random warps", fontsize=10)
        fig.tight_layout()
        out = os.path.join(args.out_dir, f"warps_{name}.png")
        fig.savefig(out, dpi=110)
        plt.close(fig)
        print(f"{name}: {ssm.dof} DOF -> {out}")


if __name__ == "__main__":
    main()
