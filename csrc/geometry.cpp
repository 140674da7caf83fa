// Host-side point-cloud geometry kernels (C++17, no dependencies).
//
// Native equivalents of the reference's CPython extensions
// (cpp_wrappers/cpp_subsampling/grid_subsampling.cpp,
//  cpp_wrappers/cpp_neighbors/neighbors.cpp + vendored nanoflann):
// used by the *host* data pipeline (offline overlap precompute,
// capacity calibration, loader-side fallbacks). The device compute
// path uses the JAX/XLA implementations in fgfusion_tpu/ops.
//
// Exposed through a C ABI for ctypes (fgfusion_tpu/native.py).
//
// Implementation notes:
// - grid_subsample: barycenter per occupied voxel, voxel id =
//   floor((p - origin)/cell) with origin = floor(min/cell)*cell,
//   matching the C++ reference semantics; output order is the hash-map
//   iteration order sorted by (z, y, x) for determinism.
// - radius_neighbors: uniform spatial hash grid with cell = radius;
//   each query scans its 27 neighboring cells. Returns the K nearest
//   supports within the radius, ascending by distance; missing slots
//   get the sentinel `ns` (shadow neighbor).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
    int64_t x, y, z;
    bool operator==(const Key& o) const noexcept {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct KeyHash {
    size_t operator()(const Key& k) const noexcept {
        uint64_t h = 1469598103934665603ull;
        auto mix = [&h](uint64_t v) {
            h ^= v + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
        };
        mix(static_cast<uint64_t>(k.x));
        mix(static_cast<uint64_t>(k.y));
        mix(static_cast<uint64_t>(k.z));
        return static_cast<size_t>(h);
    }
};

inline Key voxel_of(const float* p, const float* origin, float inv_cell) {
    return Key{static_cast<int64_t>(std::floor((p[0] - origin[0]) * inv_cell)),
               static_cast<int64_t>(std::floor((p[1] - origin[1]) * inv_cell)),
               static_cast<int64_t>(std::floor((p[2] - origin[2]) * inv_cell))};
}

}  // namespace

extern "C" {

// Barycenter voxel-grid subsampling.
// pts: (n, 3) float32. out_pts: caller-allocated (n, 3).
// Returns the number of output points (<= n).
int fg_grid_subsample(const float* pts, int n, float cell, float* out_pts) {
    if (n <= 0) return 0;
    float mins[3] = {pts[0], pts[1], pts[2]};
    for (int i = 1; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            mins[d] = std::min(mins[d], pts[i * 3 + d]);
    float origin[3];
    for (int d = 0; d < 3; ++d)
        origin[d] = std::floor(mins[d] / cell) * cell;

    struct Acc { double s[3] = {0, 0, 0}; int c = 0; };
    std::unordered_map<Key, Acc, KeyHash> cells;
    cells.reserve(static_cast<size_t>(n));
    const float inv_cell = 1.0f / cell;
    for (int i = 0; i < n; ++i) {
        Acc& a = cells[voxel_of(pts + i * 3, origin, inv_cell)];
        for (int d = 0; d < 3; ++d) a.s[d] += pts[i * 3 + d];
        a.c += 1;
    }

    std::vector<std::pair<Key, Acc>> sorted(cells.begin(), cells.end());
    std::sort(sorted.begin(), sorted.end(), [](const auto& a, const auto& b) {
        if (a.first.z != b.first.z) return a.first.z < b.first.z;
        if (a.first.y != b.first.y) return a.first.y < b.first.y;
        return a.first.x < b.first.x;
    });

    int m = 0;
    for (const auto& [key, acc] : sorted) {
        (void)key;
        for (int d = 0; d < 3; ++d)
            out_pts[m * 3 + d] = static_cast<float>(acc.s[d] / acc.c);
        ++m;
    }
    return m;
}

// K-nearest-within-radius via spatial hash grid.
// queries (nq,3), supports (ns,3) float32; out_idx (nq, k) int32 with
// sentinel = ns for missing slots; neighbors ascending by distance.
void fg_radius_neighbors(const float* queries, int nq, const float* supports,
                         int ns, float radius, int k, int* out_idx) {
    const float r2 = radius * radius;
    float origin[3] = {0, 0, 0};
    if (ns > 0) {
        origin[0] = supports[0]; origin[1] = supports[1]; origin[2] = supports[2];
        for (int i = 1; i < ns; ++i)
            for (int d = 0; d < 3; ++d)
                origin[d] = std::min(origin[d], supports[i * 3 + d]);
    }
    const float inv_cell = 1.0f / radius;

    std::unordered_map<Key, std::vector<int>, KeyHash> grid;
    grid.reserve(static_cast<size_t>(ns));
    for (int i = 0; i < ns; ++i)
        grid[voxel_of(supports + i * 3, origin, inv_cell)].push_back(i);

    std::vector<std::pair<float, int>> cand;
    for (int q = 0; q < nq; ++q) {
        cand.clear();
        const float* qp = queries + q * 3;
        Key c = voxel_of(qp, origin, inv_cell);
        for (int64_t dz = -1; dz <= 1; ++dz)
            for (int64_t dy = -1; dy <= 1; ++dy)
                for (int64_t dx = -1; dx <= 1; ++dx) {
                    auto it = grid.find(Key{c.x + dx, c.y + dy, c.z + dz});
                    if (it == grid.end()) continue;
                    for (int s : it->second) {
                        const float* sp = supports + s * 3;
                        float d2 = 0;
                        for (int d = 0; d < 3; ++d) {
                            float diff = qp[d] - sp[d];
                            d2 += diff * diff;
                        }
                        if (d2 < r2) cand.emplace_back(d2, s);
                    }
                }
        const int take = std::min<int>(k, static_cast<int>(cand.size()));
        std::partial_sort(cand.begin(), cand.begin() + take, cand.end());
        int* row = out_idx + static_cast<int64_t>(q) * k;
        for (int j = 0; j < take; ++j) row[j] = cand[j].second;
        for (int j = take; j < k; ++j) row[j] = ns;
    }
}

// Nearest support within radius for each query (-1 if none).
void fg_nearest_within_radius(const float* queries, int nq,
                              const float* supports, int ns, float radius,
                              int* out_idx) {
    std::vector<int> knn(static_cast<size_t>(nq));
    fg_radius_neighbors(queries, nq, supports, ns, radius, 1, knn.data());
    for (int i = 0; i < nq; ++i)
        out_idx[i] = (knn[i] == ns) ? -1 : knn[i];
}

}  // extern "C"
