// Host-side point-cloud kernels for the s4g_tpu runtime.
//
// The TPU owns the jitted compute path; these native kernels serve the
// host-side data plumbing where the reference leaned on Open3D's C++
// (voxel_down_sample_and_trace / remove_radius_outlier,
// reference cloud_processor.py:31-43,
// torch_precomputed_single_view_point_cloud.py:87-95): a hash-grid voxel
// downsample with max-index trace and a grid-accelerated radius outlier
// filter.  Exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC host_ops.cpp -o libs4g_host.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int32_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // large-prime mix; collisions only cost probe time
        return (static_cast<size_t>(k.x) * 73856093u) ^
               (static_cast<size_t>(k.y) * 19349663u) ^
               (static_cast<size_t>(k.z) * 83492791u);
    }
};

struct VoxelAgg {
    double sx = 0, sy = 0, sz = 0;
    int32_t count = 0;
    int64_t max_index = -1;
};

}  // namespace

extern "C" {

// Voxel downsample with per-voxel mean position and max-original-index trace.
// points: (n, 3) float32. out_points: (capacity, 3). out_trace: (capacity,).
// Returns the number of voxels written (<= capacity).
int64_t voxel_downsample_trace(const float* points, int64_t n,
                               float voxel_size, float origin_x,
                               float origin_y, float origin_z,
                               float* out_points, int64_t* out_trace,
                               int64_t capacity) {
    std::unordered_map<CellKey, VoxelAgg, CellHash> grid;
    grid.reserve(static_cast<size_t>(n));
    const float inv = 1.0f / voxel_size;
    for (int64_t i = 0; i < n; ++i) {
        const float* p = points + i * 3;
        CellKey key{static_cast<int32_t>(std::floor((p[0] - origin_x) * inv)),
                    static_cast<int32_t>(std::floor((p[1] - origin_y) * inv)),
                    static_cast<int32_t>(std::floor((p[2] - origin_z) * inv))};
        VoxelAgg& agg = grid[key];
        agg.sx += p[0];
        agg.sy += p[1];
        agg.sz += p[2];
        agg.count += 1;
        if (i > agg.max_index) agg.max_index = i;
    }
    int64_t out = 0;
    for (const auto& kv : grid) {
        if (out >= capacity) break;
        const VoxelAgg& a = kv.second;
        out_points[out * 3 + 0] = static_cast<float>(a.sx / a.count);
        out_points[out * 3 + 1] = static_cast<float>(a.sy / a.count);
        out_points[out * 3 + 2] = static_cast<float>(a.sz / a.count);
        out_trace[out] = a.max_index;
        ++out;
    }
    return out;
}

// Radius outlier filter: keep[i] = 1 when >= min_neighbors points (self
// included) lie within radius.  Grid-accelerated: O(n * k) instead of O(n^2).
void radius_outlier_mask(const float* points, int64_t n, float radius,
                         int32_t min_neighbors, uint8_t* keep) {
    const float inv = 1.0f / radius;
    const float r2 = radius * radius;
    std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
    grid.reserve(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i) {
        const float* p = points + i * 3;
        CellKey key{static_cast<int32_t>(std::floor(p[0] * inv)),
                    static_cast<int32_t>(std::floor(p[1] * inv)),
                    static_cast<int32_t>(std::floor(p[2] * inv))};
        grid[key].push_back(static_cast<int32_t>(i));
    }
    for (int64_t i = 0; i < n; ++i) {
        const float* p = points + i * 3;
        const int32_t cx = static_cast<int32_t>(std::floor(p[0] * inv));
        const int32_t cy = static_cast<int32_t>(std::floor(p[1] * inv));
        const int32_t cz = static_cast<int32_t>(std::floor(p[2] * inv));
        int32_t count = 0;
        for (int32_t dx = -1; dx <= 1 && count < min_neighbors; ++dx)
            for (int32_t dy = -1; dy <= 1 && count < min_neighbors; ++dy)
                for (int32_t dz = -1; dz <= 1 && count < min_neighbors; ++dz) {
                    auto it = grid.find(CellKey{cx + dx, cy + dy, cz + dz});
                    if (it == grid.end()) continue;
                    for (int32_t j : it->second) {
                        const float* q = points + j * 3;
                        const float ddx = p[0] - q[0];
                        const float ddy = p[1] - q[1];
                        const float ddz = p[2] - q[2];
                        if (ddx * ddx + ddy * ddy + ddz * ddz < r2) {
                            if (++count >= min_neighbors) break;
                        }
                    }
                }
        keep[i] = count >= min_neighbors ? 1 : 0;
    }
}

// 1-NN match of query points into a reference cloud within max_radius.
// Grid-accelerated; out_index[i] = -1 when nothing within max_radius.
void nearest_neighbor_match(const float* query, int64_t nq,
                            const float* ref, int64_t nr, float max_radius,
                            int64_t* out_index, float* out_dist2) {
    const float inv = 1.0f / max_radius;
    std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
    grid.reserve(static_cast<size_t>(nr));
    for (int64_t i = 0; i < nr; ++i) {
        const float* p = ref + i * 3;
        CellKey key{static_cast<int32_t>(std::floor(p[0] * inv)),
                    static_cast<int32_t>(std::floor(p[1] * inv)),
                    static_cast<int32_t>(std::floor(p[2] * inv))};
        grid[key].push_back(static_cast<int32_t>(i));
    }
    const float r2 = max_radius * max_radius;
    for (int64_t i = 0; i < nq; ++i) {
        const float* p = query + i * 3;
        const int32_t cx = static_cast<int32_t>(std::floor(p[0] * inv));
        const int32_t cy = static_cast<int32_t>(std::floor(p[1] * inv));
        const int32_t cz = static_cast<int32_t>(std::floor(p[2] * inv));
        int64_t best = -1;
        float best_d = r2;
        for (int32_t dx = -1; dx <= 1; ++dx)
            for (int32_t dy = -1; dy <= 1; ++dy)
                for (int32_t dz = -1; dz <= 1; ++dz) {
                    auto it = grid.find(CellKey{cx + dx, cy + dy, cz + dz});
                    if (it == grid.end()) continue;
                    for (int32_t j : it->second) {
                        const float* q = ref + j * 3;
                        const float ddx = p[0] - q[0];
                        const float ddy = p[1] - q[1];
                        const float ddz = p[2] - q[2];
                        const float d = ddx * ddx + ddy * ddy + ddz * ddz;
                        if (d <= best_d) {
                            // ties resolve to the lower index like the
                            // KD-tree in the reference
                            if (d < best_d || (best >= 0 && j < best)) {
                                best_d = d;
                                best = j;
                            } else if (best < 0) {
                                best_d = d;
                                best = j;
                            }
                        }
                    }
                }
        out_index[i] = best;
        out_dist2[i] = best >= 0 ? best_d : -1.0f;
    }
}

}  // extern "C"
