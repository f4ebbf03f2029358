"""Full data-generation factory on a tiny synthetic scene: sim -> render ->
grade -> label transfer -> movability -> merge -> train one step (the
reference pipeline end-to-end, BASELINE config #5)."""

import numpy as np
import pytest

pytest.importorskip("mujoco")

from s4g_tpu.datagen.generate import generate_end_to_end, grade_object
from s4g_tpu.datagen.scene_sim import ObjectSpec
from test_datagen_pipeline import _box_mesh


@pytest.mark.slow
def test_generate_end_to_end_and_train(tmp_path):
    meshes = {
        "boxA": _box_mesh(0.028),
        "boxB": _box_mesh(0.022),
    }
    specs = [
        ObjectSpec(name="boxA", geom_type="box", size="0.028 0.028 0.028"),
        ObjectSpec(name="boxB", geom_type="box", size="0.022 0.022 0.022"),
    ]
    merged = generate_end_to_end(meshes, specs, str(tmp_path), scene_id=0,
                                 num_views=2, percentage=1.1, seed=3,
                                 label_capacity=8192, render_wh=(320, 240))
    assert len(merged) == 2

    import pickle
    with open(merged[0], "rb") as f:
        data = pickle.load(f)
    for key in ("point_cloud", "valid_index", "valid_frame", "search_score",
                "antipodal_score", "objects_label", "direction"):
        assert key in data, key
    assert data["direction"].shape == (3, 5)  # 2 objects + table row

    # at least one view should find labeled grasps on graspable boxes
    total_grasps = 0
    for path in merged:
        with open(path, "rb") as f:
            d = pickle.load(f)
        total_grasps += len(d["valid_index"])
    assert total_grasps > 0

    # the merged pickles feed the trainer end-to-end
    from s4g_tpu.train.dataset import SceneGraspDataset
    import os
    ds = SceneGraspDataset(os.path.dirname(merged[0]), num_points=256,
                           score_classes=3, batch_size=2,
                           num_frame_points=32, seed=0)
    batch = next(iter(ds))
    assert batch["scene_points"].shape == (2, 3, 256)
    assert np.isfinite(batch["scene_points"]).all()
    assert batch["scene_movable_labels"].max() <= 1.0


@pytest.mark.slow
def test_generate_end_to_end_mesh_asset(tmp_path):
    """Mesh-ASSET scene (geom_type="mesh" + STL on disk) through the full
    factory — guards the MJCF asset-block emission path that primitive
    scenes never exercise (the round-3 build_arena_xml bug: mesh <asset>
    entries were collected but never written into the document)."""
    import os

    from s4g_tpu.datagen.mesh_tools import make_icosphere, save_stl

    verts, tris = make_icosphere(radius=0.03, subdiv=1)
    stl = str(tmp_path / "ico.stl")
    save_stl(stl, verts, tris)

    meshes = {"ico": (verts, tris)}
    specs = [ObjectSpec(name="ico", geom_type="mesh", mesh_files=[stl])]
    merged = generate_end_to_end(meshes, specs, str(tmp_path), scene_id=0,
                                 num_views=1, percentage=1.1, seed=0,
                                 label_capacity=8192, render_wh=(320, 240))
    assert len(merged) == 1

    import pickle
    with open(merged[0], "rb") as f:
        d = pickle.load(f)
    assert len(d["valid_index"]) > 0, "no labeled grasp points on the mesh"
    assert np.asarray(d["search_score"]).max() > 0
    # the object must actually be in view: some points labeled non-table
    assert (np.asarray(d["objects_label"]) == 0).sum() > 50


@pytest.mark.slow
def test_generate_scenes_parallel_matches_resumed_sequential(tmp_path):
    """workers=2 spawn-pool fan-out (reference generate_simulation.py mp.Pool)
    must produce byte-identical labels to a RESUMED sequential run (object
    grading cache already present).  That is the driver's contract: grading
    consumes a scene's numpy rng draws only on a cache miss, so a cold run
    and a resumed run differ in the grading scene's render-noise stream —
    a quirk the sequential driver always had; workers>1 pre-grades (hoists
    the cache misses) and therefore lands on the resumed stream."""
    import os
    import pickle
    import shutil

    from s4g_tpu.datagen.generate import generate_scenes

    meshes = {"boxA": _box_mesh(0.028), "boxB": _box_mesh(0.022)}
    specs_per_scene = [
        [ObjectSpec(name="boxA", geom_type="box", size="0.028 0.028 0.028")],
        [ObjectSpec(name="boxB", geom_type="box", size="0.022 0.022 0.022")],
    ]
    kwargs = dict(num_views=1, percentage=1.1, base_seed=3,
                  label_capacity=4096, render_wh=(320, 240))

    seq_dir, par_dir = str(tmp_path / "seq"), str(tmp_path / "par")
    generate_scenes(meshes, specs_per_scene, seq_dir, workers=1,
                    **kwargs)                       # cold: seeds the cache
    seq = generate_scenes(meshes, specs_per_scene, seq_dir, workers=1,
                          **kwargs)                 # resumed (warm) stream
    shutil.copytree(os.path.join(seq_dir, "single_object_data"),
                    os.path.join(par_dir, "single_object_data"))
    par = generate_scenes(meshes, specs_per_scene, par_dir, workers=2,
                          **kwargs)
    assert [len(p) for p in seq] == [len(p) for p in par]
    for s_paths, p_paths in zip(seq, par):
        for sp, pp in zip(s_paths, p_paths):
            with open(sp, "rb") as f:
                a = pickle.load(f)
            with open(pp, "rb") as f:
                b = pickle.load(f)
            assert sorted(a.keys()) == sorted(b.keys())
            for key in ("point_cloud", "search_score", "valid_index"):
                np.testing.assert_array_equal(np.asarray(a[key]),
                                              np.asarray(b[key]), err_msg=key)


@pytest.mark.slow
def test_grade_object_produces_valid_fields():
    verts, tris = _box_mesh(0.03)
    data = grade_object(verts, tris, num_points=1500,
                        rng=np.random.RandomState(0))
    n = len(data["cloud"])
    assert data["normal"].shape == (n, 3)
    assert data["frame"].shape == (n, 3, 3)
    assert data["search_score"].shape[0] == n
    # outward normals: positive dot with position (centered box)
    center = data["cloud"].mean(0)
    dots = np.sum(data["normal"] * (data["cloud"] - center), axis=1)
    assert (dots > 0).mean() > 0.9
    assert data["search_score"].max() > 0
