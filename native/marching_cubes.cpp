// Marching-cubes isosurface extraction + binary PLY writer.
//
// Native (C++) replacement for the mesh-extraction stage of the reference's
// TSDF pipeline (reference: sample-data/run-tsdf-reconstruction.py:334-351,
// which uses skimage.measure.marching_cubes_lewiner; classic Lorensen-Cline
// marching cubes here — same isosurface, different degenerate-case
// tessellation). The TSDF *integration* runs on-device (see
// dvmvs_tpu/ops/tsdf.py); only mesh extraction and file IO are host-side.
//
// C API (ctypes-friendly):
//   mc_run(volume, dx, dy, dz, level, &handle) -> counts
//   mc_get_vertices / mc_get_normals / mc_get_faces -> copy out
//   mc_free(handle)
// Vertices are in voxel-grid coordinates (x, y, z) like skimage; the Python
// wrapper applies origin/voxel_size and samples vertex colors.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

#include "mc_tables.h"

namespace {

struct MeshResult {
  std::vector<float> verts;    // 3 * n_verts (voxel coords)
  std::vector<float> normals;  // 3 * n_verts (gradient-based, normalized)
  std::vector<int32_t> faces;  // 3 * n_faces
};

inline int64_t edge_key(int x, int y, int z, int axis, int dy, int dz) {
  // unique id for an edge starting at voxel (x,y,z) along axis
  return (((int64_t)x * dy + y) * dz + z) * 3 + axis;
}

}  // namespace

extern "C" {

// Returns 0 on success. volume is a dx*dy*dz float array in C order
// (x-major, like numpy (dx, dy, dz)).
int mc_run(const float* vol, int dx, int dy, int dz, float level,
           void** handle, int64_t* n_verts, int64_t* n_faces) {
  auto at = [&](int x, int y, int z) -> float {
    return vol[((int64_t)x * dy + y) * dz + z];
  };

  auto* mesh = new MeshResult();
  std::unordered_map<int64_t, int32_t> edge_to_vert;
  edge_to_vert.reserve(1 << 16);

  // corner offsets in the conventional MC ordering
  static const int off[8][3] = {
      {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
      {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  // the 12 edges as (corner_a, corner_b)
  static const int edges[12][2] = {
      {0, 1}, {1, 2}, {2, 3}, {3, 0}, {4, 5}, {5, 6},
      {6, 7}, {7, 4}, {0, 4}, {1, 5}, {2, 6}, {3, 7}};

  auto interp_vertex = [&](int x, int y, int z, int e) -> int32_t {
    int ax = x + off[edges[e][0]][0], ay = y + off[edges[e][0]][1],
        az = z + off[edges[e][0]][2];
    int bx = x + off[edges[e][1]][0], by = y + off[edges[e][1]][1],
        bz = z + off[edges[e][1]][2];
    // canonical edge id: lower corner + axis
    int axis = (ax != bx) ? 0 : (ay != by ? 1 : 2);
    int cx = ax < bx ? ax : bx, cy = ay < by ? ay : by, cz = az < bz ? az : bz;
    int64_t key = edge_key(cx, cy, cz, axis, dy + 1, dz + 1);
    auto it = edge_to_vert.find(key);
    if (it != edge_to_vert.end()) return it->second;

    float va = at(ax, ay, az), vb = at(bx, by, bz);
    float t = (vb != va) ? (level - va) / (vb - va) : 0.5f;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    float px = ax + t * (bx - ax), py = ay + t * (by - ay),
          pz = az + t * (bz - az);

    // gradient normal via central differences at both corners, lerped
    auto grad = [&](int gx, int gy, int gz, float* g) {
      int x0 = gx > 0 ? gx - 1 : gx, x1 = gx < dx - 1 ? gx + 1 : gx;
      int y0 = gy > 0 ? gy - 1 : gy, y1 = gy < dy - 1 ? gy + 1 : gy;
      int z0 = gz > 0 ? gz - 1 : gz, z1 = gz < dz - 1 ? gz + 1 : gz;
      g[0] = (at(x1, gy, gz) - at(x0, gy, gz)) / (float)(x1 - x0 ? x1 - x0 : 1);
      g[1] = (at(gx, y1, gz) - at(gx, y0, gz)) / (float)(y1 - y0 ? y1 - y0 : 1);
      g[2] = (at(gx, gy, z1) - at(gx, gy, z0)) / (float)(z1 - z0 ? z1 - z0 : 1);
    };
    float ga[3], gb[3], n[3];
    grad(ax, ay, az, ga);
    grad(bx, by, bz, gb);
    for (int i = 0; i < 3; i++) n[i] = ga[i] + t * (gb[i] - ga[i]);
    float nn = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (nn > 1e-12f)
      for (int i = 0; i < 3; i++) n[i] /= nn;

    int32_t idx = (int32_t)(mesh->verts.size() / 3);
    mesh->verts.push_back(px);
    mesh->verts.push_back(py);
    mesh->verts.push_back(pz);
    mesh->normals.push_back(n[0]);
    mesh->normals.push_back(n[1]);
    mesh->normals.push_back(n[2]);
    edge_to_vert.emplace(key, idx);
    return idx;
  };

  for (int x = 0; x < dx - 1; x++) {
    for (int y = 0; y < dy - 1; y++) {
      for (int z = 0; z < dz - 1; z++) {
        int cube = 0;
        for (int c = 0; c < 8; c++) {
          if (at(x + off[c][0], y + off[c][1], z + off[c][2]) < level)
            cube |= 1 << c;
        }
        if (kEdgeTable[cube] == 0) continue;
        const int* tri = kTriTable[cube];
        for (int t = 0; tri[t] != -1; t += 3) {
          int32_t a = interp_vertex(x, y, z, tri[t]);
          int32_t b = interp_vertex(x, y, z, tri[t + 1]);
          int32_t c = interp_vertex(x, y, z, tri[t + 2]);
          if (a == b || b == c || a == c) continue;  // degenerate
          mesh->faces.push_back(a);
          mesh->faces.push_back(b);
          mesh->faces.push_back(c);
        }
      }
    }
  }

  *handle = mesh;
  *n_verts = (int64_t)(mesh->verts.size() / 3);
  *n_faces = (int64_t)(mesh->faces.size() / 3);
  return 0;
}

void mc_get_vertices(void* handle, float* out) {
  auto* m = (MeshResult*)handle;
  std::memcpy(out, m->verts.data(), m->verts.size() * sizeof(float));
}

void mc_get_normals(void* handle, float* out) {
  auto* m = (MeshResult*)handle;
  std::memcpy(out, m->normals.data(), m->normals.size() * sizeof(float));
}

void mc_get_faces(void* handle, int32_t* out) {
  auto* m = (MeshResult*)handle;
  std::memcpy(out, m->faces.data(), m->faces.size() * sizeof(int32_t));
}

void mc_free(void* handle) { delete (MeshResult*)handle; }

// ---------------------------------------------------------------- PLY IO
// ASCII PLY mesh writer with vertex normals + colors, matching the
// reference's meshwrite layout (run-tsdf-reconstruction.py:383-417).
int ply_write_mesh(const char* path, const float* verts, const float* norms,
                   const uint8_t* colors, int64_t n_verts,
                   const int32_t* faces, int64_t n_faces) {
  FILE* f = fopen(path, "w");
  if (!f) return 1;
  fprintf(f,
          "ply\nformat ascii 1.0\nelement vertex %lld\n"
          "property float x\nproperty float y\nproperty float z\n"
          "property float nx\nproperty float ny\nproperty float nz\n"
          "property uchar red\nproperty uchar green\nproperty uchar blue\n"
          "element face %lld\nproperty list uchar int vertex_index\n"
          "end_header\n",
          (long long)n_verts, (long long)n_faces);
  for (int64_t i = 0; i < n_verts; i++) {
    fprintf(f, "%f %f %f %f %f %f %d %d %d\n", verts[3 * i], verts[3 * i + 1],
            verts[3 * i + 2], norms[3 * i], norms[3 * i + 1], norms[3 * i + 2],
            colors[3 * i], colors[3 * i + 1], colors[3 * i + 2]);
  }
  for (int64_t i = 0; i < n_faces; i++) {
    fprintf(f, "3 %d %d %d\n", faces[3 * i], faces[3 * i + 1],
            faces[3 * i + 2]);
  }
  fclose(f);
  return 0;
}

int ply_write_points(const char* path, const float* xyz, const uint8_t* rgb,
                     int64_t n) {
  FILE* f = fopen(path, "w");
  if (!f) return 1;
  fprintf(f,
          "ply\nformat ascii 1.0\nelement vertex %lld\n"
          "property float x\nproperty float y\nproperty float z\n"
          "property uchar red\nproperty uchar green\nproperty uchar blue\n"
          "end_header\n",
          (long long)n);
  for (int64_t i = 0; i < n; i++) {
    fprintf(f, "%f %f %f %d %d %d\n", xyz[3 * i], xyz[3 * i + 1],
            xyz[3 * i + 2], rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
