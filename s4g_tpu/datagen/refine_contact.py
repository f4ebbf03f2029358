"""Contact-object grasp refinement + smoothing (contact-flavour pipeline).

Re-design of the reference's two post-stages for contact single-object data:

* refine_contact_object — re-check every cached frame under small gripper
  perturbations (reference: data_gen/utils/refine_contact_object.py:20-121):
  for each offset (dz in HEIGHT_SEARCH) x (dy in WIDTH_SEARCH) x
  (dx in LENGTH_SEARCH) the finger-sweep region must be collision-free, the
  close region must hold at least MIN_REFINE_SCORE points, and no close-region
  point may sit behind the palm (local x < 0).  The refined search_score is
  the minimum close-region population over all offsets.  The reference loops
  frame-by-frame in python; here one batched (frames x offsets x points)
  masked reduction runs on the accelerator.

* smooth_contact_object — per-point frame budget + neighbour redistribution
  (reference: data_gen/utils/smooth_contact_object.py:18-102): keep at most
  FRAME_PER_POINT frames per grasp point; when a point holds more than that
  and has >5 extras, hand extras to its 5 nearest neighbours within 1 cm
  (earlier points get the full budget, later points MAX_NEIGHBOR_FRAME).
  Sequential by construction (the budget bookkeeping is a running state), so
  this stays host-side numpy like the reference.

Both take/return the contact per-object dict layout produced by
datagen.contact: {cloud (N,3), normal (N,3), global_to_local (F,4,4),
search_score (F,), antipodal_score (F,), frame_point_index (F,)}.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import gripper_config as G
from .grading import DATAGEN_BOTTOM_LENGTH

# reference refine_contact_object.py:16-23
MIN_REFINE_SCORE = 100
WIDTH_SEARCH = (0.0,)
HEIGHT_SEARCH = (-0.01, 0.01, 0.0)
LENGTH_SEARCH = (-0.01, 0.01, 0.0)

# reference smooth_contact_object.py:14-16
SMOOTH_FRAME_PER_POINT = 5
SMOOTH_MAX_NEIGHBOR_FRAME = 4
SMOOTH_MIN_SEARCH_SCORE = 50
SMOOTH_NEIGHBOR_RADIUS = 0.01
SMOOTH_NEIGHBOR_NN = 5


@functools.partial(jax.jit, static_argnums=())
def _refine_chunk(frames: jnp.ndarray, homo_cloud: jnp.ndarray) -> jnp.ndarray:
    """Batched perturbation re-check for a chunk of frames.

    Args:
        frames: (F, 4, 4) global->local gripper frames.
        homo_cloud: (4, N) homogeneous object cloud.

    Returns:
        (F,) int32 refined scores; -1 where the frame fails any offset
        (collision, under-populated close region, or a close-region point
        behind the palm — reference refine_contact_object.py:71-97).
    """
    local = frames @ homo_cloud                      # (F, 4, N)
    x, y, z = local[:, 0], local[:, 1], local[:, 2]  # (F, N) each

    dz = jnp.asarray(HEIGHT_SEARCH)[:, None, None, None]   # (Hz,1,1,1)
    dy = jnp.asarray(WIDTH_SEARCH)[None, :, None, None]    # (1,Wy,1,1)
    dx = jnp.asarray(LENGTH_SEARCH)[None, None, :, None]   # (1,1,Lx,1)

    z_bool = (z[:, None, None, None, :] < G.HALF_HAND_THICKNESS + dz) & \
             (z[:, None, None, None, :] > -G.HALF_HAND_THICKNESS + dz)
    y_in = (y[:, None, None, None, :] < G.HALF_BOTTOM_SPACE + dy) & \
           (y[:, None, None, None, :] > -G.HALF_BOTTOM_SPACE + dy)
    abs_y = jnp.abs(y[:, None, None, None, :] + dy)
    y_col = (abs_y > G.HALF_BOTTOM_SPACE) & (abs_y < G.HALF_BOTTOM_WIDTH)
    x_bool = (x[:, None, None, None, :] > -DATAGEN_BOTTOM_LENGTH + dx) & \
             (x[:, None, None, None, :] < G.FINGER_LENGTH + dx)

    collision = jnp.any(z_bool & x_bool & y_col, axis=-1)       # (F,Hz,Wy,Lx)
    close = x_bool & z_bool & y_in
    close_num = jnp.sum(close, axis=-1, dtype=jnp.int32)
    behind = jnp.any(close & (x[:, None, None, None, :] < 0), axis=-1)

    ok = (~collision) & (close_num >= MIN_REFINE_SCORE) & (~behind)
    all_ok = jnp.all(ok, axis=(1, 2, 3))                        # (F,)
    score = jnp.min(close_num, axis=(1, 2, 3))
    return jnp.where(all_ok, score, -1)


def refine_contact_object(data: Dict[str, np.ndarray],
                          chunk: int = 2048) -> dict:
    """Filter + re-score contact frames under gripper perturbations.

    Mirrors refine_contact_object.py:44-116: frames below MIN_REFINE_SCORE
    are dropped up front, survivors get the min close-region population over
    the offset grid as their new search_score.
    """
    cloud = np.asarray(data["cloud"], np.float32)
    normal = np.asarray(data["normal"], np.float32)
    frames = np.asarray(data["global_to_local"], np.float32)
    search = np.asarray(data["search_score"])
    antipodal = np.asarray(data["antipodal_score"])
    point_index = np.asarray(data["frame_point_index"]).astype(np.int64)

    keep = search > MIN_REFINE_SCORE                # reference :46
    frames, search = frames[keep], search[keep]
    antipodal, point_index = antipodal[keep], point_index[keep]

    homo = jnp.asarray(
        np.concatenate([cloud.T, np.ones((1, len(cloud)), np.float32)]))

    scores = []
    for s in range(0, len(frames), chunk):
        scores.append(np.asarray(
            _refine_chunk(jnp.asarray(frames[s:s + chunk]), homo)))
    scores = (np.concatenate(scores) if scores
              else np.zeros((0,), np.int32))
    ok = scores > 0

    return {
        "cloud": cloud,
        "normal": normal,
        "global_to_local": frames[ok],
        "frame_point_index": point_index[ok],
        "search_score": scores[ok].astype(np.float64),
        "antipodal_score": antipodal[ok],
    }


def _radius_neighbors(cloud: np.ndarray, i: int, radius: float,
                      max_nn: int) -> np.ndarray:
    """Up to max_nn nearest points within radius, ascending distance —
    open3d search_hybrid_vector_3d semantics (includes the query point)."""
    d2 = np.sum((cloud - cloud[i]) ** 2, axis=1)
    within = np.nonzero(d2 <= radius * radius)[0]
    order = within[np.argsort(d2[within], kind="stable")]
    return order[:max_nn]


def smooth_contact_object(data: Dict[str, np.ndarray]) -> dict:
    """Per-point frame budget + neighbour redistribution.

    Mirrors smooth_contact_object.py:36-99, including its quirks: the
    extras handed to neighbours start at index FRAME_PER_POINT of the
    point's frame list (not after the taken prefix), and the self-neighbour
    returned by the hybrid KD search is skipped because neither budget
    branch matches it.
    """
    cloud = np.asarray(data["cloud"], np.float64)
    frames = np.asarray(data["global_to_local"])
    search = np.asarray(data["search_score"])
    antipodal = np.asarray(data["antipodal_score"])
    point_index = np.asarray(data["frame_point_index"]).astype(np.int64)

    keep = search > SMOOTH_MIN_SEARCH_SCORE         # reference :37
    frames, search = frames[keep], search[keep]
    antipodal, point_index = antipodal[keep], point_index[keep]

    num_points = len(cloud)
    point_frame_num = np.zeros(num_points, np.int64)
    frame_list, index_list, search_list, anti_list = [], [], [], []

    for i in range(num_points):
        mine = np.nonzero(point_index == i)[0]
        if len(mine) > SMOOTH_FRAME_PER_POINT:
            take = mine[:SMOOTH_FRAME_PER_POINT - point_frame_num[i]]
            frame_list.append(frames[take])
            search_list.append(search[take])
            anti_list.append(antipodal[take])
            index_list.extend([i] * len(take))
            point_frame_num[i] += len(take)
            rest = mine[SMOOTH_FRAME_PER_POINT:]
            if len(rest) > 5:
                nbrs = _radius_neighbors(cloud, i, SMOOTH_NEIGHBOR_RADIUS,
                                         SMOOTH_NEIGHBOR_NN)
                for nn_num, nb in enumerate(nbrs):
                    if nn_num >= len(rest):
                        break
                    cap = (SMOOTH_FRAME_PER_POINT if nb < i
                           else SMOOTH_MAX_NEIGHBOR_FRAME)
                    if nb != i and point_frame_num[nb] < cap:
                        point_frame_num[nb] += 1
                        frame_list.append(frames[rest[nn_num:nn_num + 1]])
                        search_list.append(search[rest[nn_num:nn_num + 1]])
                        anti_list.append(antipodal[rest[nn_num:nn_num + 1]])
                        index_list.append(int(nb))
        elif len(mine) > 0:
            take = min(SMOOTH_FRAME_PER_POINT - point_frame_num[i], len(mine))
            frame_list.append(frames[mine[:take]])
            search_list.append(search[mine[:take]])
            anti_list.append(antipodal[mine[:take]])
            index_list.extend([i] * take)
            point_frame_num[i] += take

    if frame_list:
        out_frames = np.concatenate(frame_list, axis=0)
        out_search = np.concatenate(search_list, axis=0)
        out_anti = np.concatenate(anti_list, axis=0)
        out_index = np.asarray(index_list, np.int64)
    else:
        out_frames = np.zeros((0, 4, 4), frames.dtype)
        out_search = np.zeros((0,), search.dtype)
        out_anti = np.zeros((0,), antipodal.dtype)
        out_index = np.zeros((0,), np.int64)

    return {
        "cloud": np.asarray(data["cloud"]),
        "normal": np.asarray(data["normal"]),
        "global_to_local": out_frames,
        "frame_point_index": out_index,
        "search_score": out_search,
        "antipodal_score": out_anti,
    }
