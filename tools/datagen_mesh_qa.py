"""Mesh-asset datagen validation (VERDICT r2 missing #4 / #9).

Runs the FULL data factory (MuJoCo drop sim -> z-buffer render -> Darboux
grading -> label transfer -> movability -> merge) on a REAL mesh asset —
the reference's bundled `objects/mesh/camera.obj` — instead of the
primitive geoms the test suite uses.  Prints label statistics so the run
is auditable.

Forces the CPU backend (the grading math is exact on either backend) so it
can run alongside TPU measurements.

Usage: python tools/datagen_mesh_qa.py [--out /tmp/s4g_mesh_qa]
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")

# Force CPU before jax initializes (conftest recipe: the hosting image
# pre-registers the TPU plugin).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if jax.default_backend() != "cpu":  # pragma: no cover
    jax.config.update("jax_platforms", "cpu")
    from jax.extend import backend as _jexb
    _jexb.clear_backends()

import numpy as np  # noqa: E402

CAMERA_OBJ = "/root/reference/objects/mesh/camera.obj"


def _scene_assets(args, out_dir):
    """Build (meshes, specs, shared-grade groups) for the requested mode.

    Default: two instances of the reference's bundled camera.obj.
    --procedural: a 4-instance scene over THREE distinct generated
    watertight meshes (icosphere / box / cylinder) — exercises multi-mesh
    asset emission, per-mesh grading, and mixed-curvature Darboux labels
    (VERDICT r2 missing #4: "a handful of real meshes").
    """
    from s4g_tpu.datagen.mesh_tools import load_obj, save_stl
    from s4g_tpu.datagen.scene_sim import ObjectSpec

    if not args.procedural:
        verts, tris = load_obj(CAMERA_OBJ)
        extent = verts.max(0) - verts.min(0)
        print(f"[mesh] camera.obj: {len(verts)} verts, {len(tris)} tris, "
              f"extent {np.round(extent, 3).tolist()} m", flush=True)
        # Two instances of the real mesh dropped on the table.  MuJoCo 3.x
        # loads OBJ assets directly; collision uses the convex hull (the
        # reference ships V-HACD decompositions for its 118 YCB meshes,
        # render/plain_vhacd.py — hull collision is the right fidelity for
        # a single-object validation run).
        specs = [ObjectSpec(name=f"cam{i}", geom_type="mesh",
                            mesh_files=[CAMERA_OBJ]) for i in range(2)]
        meshes = {f"cam{i}": (verts.astype(np.float64), tris)
                  for i in range(2)}
        return meshes, specs, {"cam0": ["cam0", "cam1"]}

    from s4g_tpu.datagen.mesh_tools import (make_box, make_cylinder,
                                            make_icosphere)
    gen = {"ico": make_icosphere(), "boxm": make_box(),
           "cyl": make_cylinder()}
    mesh_dir = os.path.join(out_dir, "meshes")
    os.makedirs(mesh_dir, exist_ok=True)
    paths = {}
    from s4g_tpu.datagen.mesh_tools import load_stl
    for name, (v, t) in gen.items():
        p = os.path.join(mesh_dir, f"{name}.stl")
        save_stl(p, v, t)
        rv, rt = load_stl(p)          # round-trip through the real loader
        assert len(rt) == len(t), f"{name}: STL round-trip lost triangles"
        paths[name] = p
        print(f"[mesh] {name}: {len(v)} verts, {len(t)} tris", flush=True)
    names = ["ico", "boxm", "cyl", "boxm2"]   # two box instances
    base = {"boxm2": "boxm"}
    specs = [ObjectSpec(name=n, geom_type="mesh",
                        mesh_files=[paths[base.get(n, n)]]) for n in names]
    meshes = {n: (gen[base.get(n, n)][0].astype(np.float64),
                  gen[base.get(n, n)][1]) for n in names}
    return meshes, specs, {"ico": ["ico"], "boxm": ["boxm", "boxm2"],
                           "cyl": ["cyl"]}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/s4g_mesh_qa")
    parser.add_argument("--views", type=int, default=2)
    parser.add_argument("--procedural", action="store_true",
                        help="three generated meshes instead of camera.obj")
    args = parser.parse_args()

    from s4g_tpu.datagen.generate import generate_end_to_end

    meshes, specs, grade_groups = _scene_assets(args, args.out)

    # Instances sharing one mesh grade ONCE and seed the per-name cache
    # (generate_end_to_end skips existing pickles) — Darboux grading is
    # minutes-per-mesh on this 1-CPU host and need not run per instance.
    import time
    obj_dir = os.path.join(args.out, "single_object_data")
    os.makedirs(obj_dir, exist_ok=True)
    for src, instances in grade_groups.items():
        if all(os.path.exists(os.path.join(obj_dir, f"{n}.p"))
               for n in instances):
            continue
        from s4g_tpu.datagen.generate import grade_object
        tic = time.time()
        v, t = meshes[src]
        data = grade_object(v, t, rng=np.random.RandomState(0))
        print(f"[grade] {src}: {len(data['cloud'])} pts, "
              f"{time.time() - tic:.0f}s", flush=True)
        for n in instances:
            with open(os.path.join(obj_dir, f"{n}.p"), "wb") as f:
                pickle.dump(data, f)

    merged = generate_end_to_end(meshes, specs, args.out, scene_id=0,
                                 num_views=args.views, percentage=1.1,
                                 seed=0, label_capacity=16384,
                                 render_wh=(640, 480))
    assert merged, "no views produced"

    from s4g_tpu.datagen.stats import per_view_stats
    stats = []
    for path in merged:
        with open(path, "rb") as f:
            d = pickle.load(f)
        cloud = np.asarray(d["point_cloud"])
        if cloud.shape[0] == 3 and cloud.shape[-1] != 3:
            cloud = cloud.T
        stats.append({
            "view": os.path.basename(path),
            "num_points": int(cloud.shape[0]),
            **per_view_stats(d),
            "keys": sorted(d.keys()),
        })
    print("[merged] " + json.dumps(stats, indent=1), flush=True)
    assert any(s["num_labeled_grasp_points"] > 0 for s in stats), \
        "no labeled grasp points on the mesh scene"
    print("MESH DATAGEN QA COMPLETE", flush=True)


if __name__ == "__main__":
    main()
