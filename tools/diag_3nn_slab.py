"""Diagnose slab 3-NN verification failures at the REAL FP3 shapes.

Round 2 measured ~7% of queries failing the axis-margin verification on
real scenes, firing the whole-call fallback (both kernels run).  Per-tile
fallback breaks even if failures CONCENTRATE in few Q_TILE-query tiles
(docs/perf_roadmap.md).  This prints the per-tile failure histogram on the
bundled scene at deployment shapes so the go/no-go is data, not hope.

Run solo on the TPU: python tools/diag_3nn_slab.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from s4g_tpu.ops.sampling import farthest_point_sample
    from s4g_tpu.ops.pallas.neighbor_kernels import (NN_K_TILE, NN_SLAB_TILES,
                                                     Q_TILE,
                                                     three_nn_slab_pallas)

    rng = np.random.RandomState(0)
    scene = np.load("/root/reference/inference/2638_view_0.p",
                    allow_pickle=True)
    cloud = scene["point_cloud"].astype(np.float32)
    sel = rng.choice(cloud.shape[1], 25600, replace=cloud.shape[1] < 25600)
    pts = cloud[:, sel]

    # Deployment FP3 inputs: dense = full sorted cloud, sparse = 5120 FPS
    # centroids of it (sorted).
    axis = int(np.argmax(pts.max(1) - pts.min(1)))
    order = np.argsort(pts[axis], kind="stable")
    pts = pts[:, order]
    q = jnp.asarray(pts[None])                           # (1, 3, 25600)
    cidx = np.asarray(farthest_point_sample(q, 5120))[0]
    k = jnp.asarray(pts[:, np.sort(cidx)][None])         # (1, 3, 5120) sorted

    n1, n2 = q.shape[2], k.shape[2]
    kt = NN_K_TILE
    cap = NN_SLAB_TILES * kt
    nk_pad = max(-(-n2 // kt) * kt, cap)
    qax = np.asarray(q[0, axis])
    kax = np.asarray(k[0, axis])
    kax_pad = np.pad(kax, (0, nk_pad - n2), constant_values=1e9)
    nq_pad = -(-n1 // Q_TILE) * Q_TILE
    qax_p = np.pad(qax, (0, nq_pad - n1), mode="edge")
    tiles = qax_p.reshape(-1, Q_TILE)
    mid = 0.5 * (tiles[:, 0] + tiles[:, -1])
    pos = np.searchsorted(kax, mid).astype(np.int32)
    lo_tile = np.clip((pos - cap // 2) // kt, 0,
                      nk_pad // kt - NN_SLAB_TILES)
    kleft = np.where(lo_tile == 0, np.float32(-1e9),
                     kax_pad[lo_tile * kt])
    kright = kax_pad[lo_tile * kt + cap - 1]

    _, ok = three_nn_slab_pallas(q, k, jnp.asarray(lo_tile), jnp.int32(axis),
                                 jnp.asarray(kleft), jnp.asarray(kright))
    ok = np.asarray(ok)
    per_tile_fail = (~ok).reshape(-1, Q_TILE).sum(1)
    print(json.dumps({
        "n_queries": int(n1),
        "fail_frac": round(float((~ok).mean()), 4),
        "n_tiles": int(len(per_tile_fail)),
        "tiles_with_any_fail": int((per_tile_fail > 0).sum()),
        "tiles_fully_ok": int((per_tile_fail == 0).sum()),
        "per_tile_fail_hist": np.histogram(
            per_tile_fail, bins=[0, 1, 8, 32, 128, 257])[0].tolist(),
    }))


if __name__ == "__main__":
    main()
