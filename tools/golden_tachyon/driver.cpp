// Golden-image driver: runs the REFERENCE CPU Tachyon renderer (read-only,
// from /root/reference) on a scene description read from stdin/file and dumps
// the raw RGBA framebuffer.  Used only at development/test time to generate
// parity fixtures for the TPU renderer — the reference code is *executed*,
// never copied into the framework.
//
// Scene file format (little-endian binary):
//   int32 width, height
//   int32 aa_enabled, aa_samples, ao_enabled, ao_samples
//   int32 shadows, direct_light
//   f64   ao_brightness, ao_maxdist, light_intensity
//   f32   bg[4]
//   int32 is_perspective; f64 fov, pos[3], dir[3], up[3], znear
//   int64 n_spheres;  then n*( f64 pos[3], f32 rgba[4], f32 radius )
//   int64 n_bonds;    f32 bond_radius; then n*( f64 p0[3] p1[3], f32 rgba[4] )
//   int64 n_boxedges; f32 box_radius, box_rgba[4]; then n*( f64 p0[3] p1[3] )
// Output: raw RGBA uint8, H*W*4 bytes (top-down rows).

#include "tachyon_render.h"
#include <cstdio>
#include <cstdlib>
#include <vector>

using namespace mdapy_tachyon;

template <typename T> T rd(FILE* f) {
    T v;
    if (fread(&v, sizeof(T), 1, f) != 1) { fprintf(stderr, "short read\n"); exit(2); }
    return v;
}

int main(int argc, char** argv) {
    if (argc != 3) { fprintf(stderr, "usage: driver scene.bin out.rgba\n"); return 1; }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("scene"); return 1; }

    RenderParams rp;
    rp.width  = rd<int32_t>(f);
    rp.height = rd<int32_t>(f);
    rp.antialiasingEnabled = rd<int32_t>(f);
    rp.antialiasingSamples = rd<int32_t>(f);
    rp.aoEnabled = rd<int32_t>(f);
    rp.aoSamples = rd<int32_t>(f);
    rp.shadowsEnabled = rd<int32_t>(f);
    rp.directLightEnabled = rd<int32_t>(f);
    rp.aoBrightness = rd<double>(f);
    rp.aoMaxDist = rd<double>(f);
    rp.directLightIntensity = rd<double>(f);
    rp.bgR = rd<float>(f); rp.bgG = rd<float>(f);
    rp.bgB = rd<float>(f); rp.bgA = rd<float>(f);
    rp.numThreads = 4;

    CameraParams cp;
    cp.isPerspective = rd<int32_t>(f);
    cp.fieldOfView = rd<double>(f);
    cp.position  = {rd<double>(f), rd<double>(f), rd<double>(f)};
    cp.direction = {rd<double>(f), rd<double>(f), rd<double>(f)};
    cp.up        = {rd<double>(f), rd<double>(f), rd<double>(f)};
    cp.znear     = rd<double>(f);

    int64_t ns = rd<int64_t>(f);
    std::vector<double> pos(ns * 3);
    std::vector<float> col(ns * 4), rad(ns);
    for (int64_t i = 0; i < ns; i++) {
        pos[i*3+0] = rd<double>(f); pos[i*3+1] = rd<double>(f); pos[i*3+2] = rd<double>(f);
        col[i*4+0] = rd<float>(f); col[i*4+1] = rd<float>(f);
        col[i*4+2] = rd<float>(f); col[i*4+3] = rd<float>(f);
        rad[i] = rd<float>(f);
    }
    ParticleData pd{pos.data(), col.data(), rad.data(), (size_t)ns};

    int64_t nb = rd<int64_t>(f);
    float bond_radius = rd<float>(f);
    std::vector<double> bpts(nb * 6);
    std::vector<float> bcol(nb * 4);
    for (int64_t i = 0; i < nb; i++) {
        for (int k = 0; k < 6; k++) bpts[i*6+k] = rd<double>(f);
        for (int k = 0; k < 4; k++) bcol[i*4+k] = rd<float>(f);
    }
    BondData bd{bpts.data(), bcol.data(), (size_t)nb, bond_radius};

    int64_t ne = rd<int64_t>(f);
    BoxEdgeData be;
    be.radius = rd<float>(f);
    be.r = rd<float>(f); be.g = rd<float>(f); be.b = rd<float>(f); be.a = rd<float>(f);
    std::vector<double> epts(ne * 6);
    for (int64_t i = 0; i < ne; i++)
        for (int k = 0; k < 6; k++) epts[i*6+k] = rd<double>(f);
    be.points = epts.data();
    be.count = (size_t)ne;
    fclose(f);

    TachyonRenderer renderer;
    std::vector<uint8_t> img = renderer.render(
        rp, cp, pd, nb > 0 ? &bd : nullptr, ne > 0 ? &be : nullptr);

    FILE* out = fopen(argv[2], "wb");
    fwrite(img.data(), 1, img.size(), out);
    fclose(out);
    return 0;
}
