"""Pure-numpy oracles implementing the reference CUDA kernels' documented
semantics (cited per function).  These are the ground truth for the
differential tests, mirroring the reference's own CUDA-vs-ATen test pattern
(reference: network_models/functions/gather_knn.py:27-60)."""

import numpy as np


def np_farthest_point_sample(points, num_centroids):
    """reference csrc/sampling_kernel.cu:50-118: first point is index 0; each
    step relaxes min-distance then takes argmax (lowest index on ties)."""
    b, _, n = points.shape
    out = np.zeros((b, num_centroids), dtype=np.int64)
    for bi in range(b):
        pts = points[bi].T  # (N, 3)
        min_d = np.full(n, np.inf)
        cur = 0
        for i in range(1, num_centroids):
            d = np.sum((pts - pts[cur]) ** 2, axis=1)
            min_d = np.minimum(min_d, d)
            cur = int(np.argmax(min_d))
            out[bi, i] = cur
    return out


def np_ball_query(points, centroids, radius, num_neighbours):
    """reference csrc/ball_query_kernel.cu:33-76: first-K in scan order,
    strict < radius^2, slot-0 fill before first hit, zeros when no hit."""
    b, _, n = points.shape
    m = centroids.shape[2]
    index = np.zeros((b, m, num_neighbours), dtype=np.int64)
    count = np.zeros((b, m), dtype=np.int64)
    r2 = radius * radius
    for bi in range(b):
        pts = points[bi].T
        cents = centroids[bi].T
        for i in range(m):
            cnt = 0
            for j in range(n):
                if cnt >= num_neighbours:
                    break
                d = np.sum((pts[j] - cents[i]) ** 2)
                if d < r2:
                    if cnt == 0:
                        index[bi, i, :] = j
                    else:
                        index[bi, i, cnt] = j
                    cnt += 1
            count[bi, i] = cnt
    return index, count


def np_ball_query_stratified(points, centroids, radius, num_neighbours):
    """Stratified-selection ball query: overfull balls (count > K) fill
    slot s with the in-range point of scan rank floor(s * total / K); for
    count <= K identical to np_ball_query (the sorted-deployment semantics,
    s4g_tpu/ops/neighbors.py::_first_k_in_range)."""
    b, _, n = points.shape
    m = centroids.shape[2]
    k = num_neighbours
    index = np.zeros((b, m, k), dtype=np.int64)
    count = np.zeros((b, m), dtype=np.int64)
    r2 = radius * radius
    for bi in range(b):
        pts = points[bi].T
        cents = centroids[bi].T
        for i in range(m):
            d = np.sum((pts - cents[i]) ** 2, axis=1)
            inr = np.where(d < r2)[0]
            t = len(inr)
            count[bi, i] = min(t, k)
            if t == 0:
                continue
            sel = inr[(np.arange(k) * t) // k] if t > k else inr
            index[bi, i, :len(sel)] = sel
            index[bi, i, len(sel):] = sel[0]
    return index, count


def np_three_nn(query, key):
    """reference csrc/interpolate_kernel.cu:33-81: 3 smallest squared
    distances, ascending, ties to lower index."""
    b, _, n1 = query.shape
    index = np.zeros((b, n1, 3), dtype=np.int64)
    distance = np.zeros((b, n1, 3), dtype=query.dtype)
    for bi in range(b):
        q = query[bi].T
        k = key[bi].T
        d = np.sum((q[:, None, :] - k[None, :, :]) ** 2, axis=-1)  # (N1, N2)
        idx = np.argsort(d, axis=1, kind="stable")[:, :3]
        index[bi] = idx
        distance[bi] = np.take_along_axis(d, idx, axis=1)
    return index, distance


def np_group_points(points, index):
    """reference csrc/grouping_kernel.cu:32-53 (gather on expanded view)."""
    b, c, _ = points.shape
    m, k = index.shape[1], index.shape[2]
    out = np.zeros((b, c, m, k), dtype=points.dtype)
    for bi in range(b):
        out[bi] = points[bi][:, index[bi].reshape(-1)].reshape(c, m, k)
    return out


def np_feature_interpolate(feature, index, weight):
    """reference csrc/interpolate_kernel.cu:139-181 (weighted 3-sum)."""
    b, c, _ = feature.shape
    n1 = index.shape[1]
    out = np.zeros((b, c, n1), dtype=feature.dtype)
    for bi in range(b):
        gathered = feature[bi][:, index[bi].reshape(-1)].reshape(c, n1, 3)
        out[bi] = np.sum(gathered * weight[bi][None], axis=-1)
    return out
