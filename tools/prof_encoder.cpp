// gprof harness for the native CELT encoder hot loop: statically links
// the plane-A TU and encodes N frames of synthetic stereo music so the
// flat profile shows where encode time actually goes.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void* celt_enc_create(int channels);
void celt_enc_destroy(void* h);
int celt_enc_encode(void* h, const float* pcm, int n, int nb_bytes, uint8_t* out);
}

int main(int argc, char** argv) {
    int frames = argc > 1 ? atoi(argv[1]) : 400;
    const int N = 960, C = 2;
    void* h = celt_enc_create(C);
    std::vector<float> pcm(N * C);
    std::vector<uint8_t> out(1275);
    uint64_t seed = 12345;
    double acc = 0;
    for (int f = 0; f < frames; f++) {
        for (int i = 0; i < N; i++) {
            double t = (f * N + i) / 48000.0;
            seed = seed * 6364136223846793005ull + 1442695040888963407ull;
            double nz = (double)(int64_t)(seed >> 20) / (double)(1ll << 43);
            double s = 0.4 * sin(2 * M_PI * 440 * t) + 0.2 * sin(2 * M_PI * 1763 * t) + 0.08 * nz;
            pcm[i * C] = (float)s;
            pcm[i * C + 1] = (float)(0.8 * s + 0.05 * nz);
        }
        int rc = celt_enc_encode(h, pcm.data(), N, 240, out.data());
        if (rc != 0) { fprintf(stderr, "encode failed %d\n", rc); return 1; }
        acc += out[0];
    }
    celt_enc_destroy(h);
    printf("done %d frames acc=%f\n", frames, acc);
    return 0;
}
