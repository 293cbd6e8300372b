// Marching-tetrahedra isosurface extraction (host-side meshing hot op).
//
// Native counterpart of xrdslam_tpu/ops/marching_tets.py — the same 6-tet
// cube split and programmatically-derived 16-case table, but as a single
// cache-friendly sweep instead of NumPy fancy-indexing passes. At mesher
// resolution 256 (reference: slam/common/mesher.py MesherConfig.resolution)
// the NumPy path spends seconds materializing [8, nx-1, ny-1, nz-1] corner
// arrays; this does one pass with zero allocations beyond the output.
//
// Exposed via ctypes (see ops/marching_tets.py); no pybind11 dependency.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

namespace {

// Cube corners in (x, y, z) bit order — must match the Python table.
const int CORNERS[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

// 6 tetrahedra sharing the main diagonal 0-6.
const int TETS[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

struct Tri {
    int e[3][2];  // three edges, each (corner_i, corner_j) within the tet
};

struct CaseEntry {
    int n_tris;
    Tri tris[2];
};

// Programmatically derived per 4-bit inside-mask (mirrors _build_tet_cases).
CaseEntry g_cases[16];
bool g_init = false;

void build_cases() {
    for (int mask = 0; mask < 16; ++mask) {
        int inside[4], outside[4], ni = 0, no = 0;
        for (int i = 0; i < 4; ++i) {
            if (mask & (1 << i)) inside[ni++] = i; else outside[no++] = i;
        }
        CaseEntry &c = g_cases[mask];
        c.n_tris = 0;
        if (ni == 1) {
            int a = inside[0];
            Tri t = {{{a, outside[0]}, {a, outside[1]}, {a, outside[2]}}};
            c.tris[c.n_tris++] = t;
        } else if (ni == 3) {
            int a = outside[0];
            Tri t = {{{inside[0], a}, {inside[2], a}, {inside[1], a}}};
            c.tris[c.n_tris++] = t;
        } else if (ni == 2) {
            int a = inside[0], b = inside[1], p = outside[0], q = outside[1];
            Tri t1 = {{{a, p}, {a, q}, {b, q}}};
            Tri t2 = {{{a, p}, {b, q}, {b, p}}};
            c.tris[c.n_tris++] = t1;
            c.tris[c.n_tris++] = t2;
        }
    }
    g_init = true;
}

}  // namespace

extern "C" {

// Returns the number of triangles written (each 9 floats into out_tris).
// vol is [nx, ny, nz] row-major (z fastest). mask (optional, same shape,
// uint8) skips cells with any masked corner. Stops at max_tris.
int64_t marching_tets(
    const float *vol, int64_t nx, int64_t ny, int64_t nz,
    float level, const double *origin, const double *spacing,
    const uint8_t *mask,
    float *out_tris, int64_t max_tris) {
    if (!g_init) build_cases();
    const int64_t syx = ny * nz, sy = nz;
    int64_t n_out = 0;
    float corner_vals[8];
    float px[4], py[4], pz[4], pv[4];

    for (int64_t x = 0; x + 1 < nx; ++x) {
        for (int64_t y = 0; y + 1 < ny; ++y) {
            const float *base0 = vol + x * syx + y * sy;
            for (int64_t z = 0; z + 1 < nz; ++z) {
                // gather cube corners; early sign check
                bool any_neg = false, any_pos = false;
                for (int c = 0; c < 8; ++c) {
                    const float v = vol[(x + CORNERS[c][0]) * syx +
                                        (y + CORNERS[c][1]) * sy +
                                        (z + CORNERS[c][2])] - level;
                    corner_vals[c] = v;
                    if (v < 0) any_neg = true; else any_pos = true;
                }
                if (!any_neg || !any_pos) continue;
                if (mask) {
                    bool ok = true;
                    for (int c = 0; c < 8 && ok; ++c)
                        ok = mask[(x + CORNERS[c][0]) * syx +
                                  (y + CORNERS[c][1]) * sy +
                                  (z + CORNERS[c][2])] != 0;
                    if (!ok) continue;
                }
                for (int t = 0; t < 6; ++t) {
                    int cse = 0;
                    for (int i = 0; i < 4; ++i) {
                        const int c = TETS[t][i];
                        pv[i] = corner_vals[c];
                        px[i] = (float)(x + CORNERS[c][0]);
                        py[i] = (float)(y + CORNERS[c][1]);
                        pz[i] = (float)(z + CORNERS[c][2]);
                        if (pv[i] < 0) cse |= (1 << i);
                    }
                    const CaseEntry &ce = g_cases[cse];
                    for (int k = 0; k < ce.n_tris; ++k) {
                        if (n_out >= max_tris) return n_out;
                        float *o = out_tris + n_out * 9;
                        for (int e = 0; e < 3; ++e) {
                            const int i = ce.tris[k].e[e][0];
                            const int j = ce.tris[k].e[e][1];
                            float denom = pv[i] - pv[j];
                            if (denom > -1e-12f && denom < 1e-12f)
                                denom = 1e-12f;
                            float tt = pv[i] / denom;
                            if (tt < 0.f) tt = 0.f;
                            if (tt > 1.f) tt = 1.f;
                            o[e * 3 + 0] = (float)(origin[0] + spacing[0] * (px[i] + tt * (px[j] - px[i])));
                            o[e * 3 + 1] = (float)(origin[1] + spacing[1] * (py[i] + tt * (py[j] - py[i])));
                            o[e * 3 + 2] = (float)(origin[2] + spacing[2] * (pz[i] + tt * (pz[j] - pz[i])));
                        }
                        ++n_out;
                    }
                }
            }
        }
    }
    return n_out;
}

}  // extern "C"
