// Clean-room CUDA API stub so the reference's CPU render path (mounted read-only
// at /root/reference) can be compiled with plain g++ as a golden-image oracle.
// GPU-namespace code in the same translation units must *compile* but is never
// executed on the CPU path; device intrinsics are inert placeholders.
#pragma once
#include <cstdlib>
#include <cstring>
#include <cstdint>

#define __device__
#define __global__
#define __host__

// ---- basic memory API (host malloc-backed) --------------------------------
enum cudaMemcpyKind {
    cudaMemcpyHostToHost = 0,
    cudaMemcpyHostToDevice = 1,
    cudaMemcpyDeviceToHost = 2,
    cudaMemcpyDeviceToDevice = 3,
    cudaMemcpyDefault = 4,
};

template <typename T>
inline int cudaMalloc(T** p, size_t sz) { *p = (T*)std::malloc(sz); return 0; }
template <typename T>
inline int cudaMallocManaged(T** p, size_t sz) { *p = (T*)std::malloc(sz); return 0; }
inline int cudaFree(void* p) { std::free(p); return 0; }
inline int cudaMemcpy(void* dst, const void* src, size_t sz, cudaMemcpyKind) {
    std::memcpy(dst, src, sz);
    return 0;
}
inline int cudaDeviceSynchronize() { return 0; }

// ---- texture objects: functional host-memory emulation --------------------
// The reference's GPU path fetches vertices/normals/atlas texels through CUDA
// texture objects (gputils/alloc.h:24-80, trimesh.cu:35-44, texture.cu:8-12).
// To execute that path serially as an oracle, the "array" is a host buffer and
// tex1D/tex2D are element reads with clamp addressing + point filtering,
// matching the texture descriptor the reference always uses.
struct cudaArray {
    float* data;
    size_t width_elems;   // row length in float elements
    size_t height_rows;
};
typedef cudaArray* cudaArray_t;
typedef cudaArray* cudaTextureObject_t;

enum cudaChannelFormatKind { cudaChannelFormatKindFloat = 0 };
struct cudaChannelFormatDesc { int x, y, z, w; cudaChannelFormatKind f; };
inline cudaChannelFormatDesc cudaCreateChannelDesc(int x, int y, int z, int w,
                                                   cudaChannelFormatKind f) {
    return cudaChannelFormatDesc{x, y, z, w, f};
}
inline int cudaMallocArray(cudaArray_t* arr, const cudaChannelFormatDesc*,
                           size_t width, size_t height) {
    cudaArray* a = new cudaArray;
    a->width_elems = width;
    a->height_rows = height ? height : 1;
    a->data = (float*)std::calloc(a->width_elems * a->height_rows, sizeof(float));
    *arr = a;
    return 0;
}
inline int cudaMemcpy2DToArray(cudaArray_t arr, size_t, size_t, const void* src,
                               size_t spitch, size_t width_bytes, size_t height,
                               cudaMemcpyKind) {
    const char* s = (const char*)src;
    for (size_t r = 0; r < height; r++)
        std::memcpy((char*)arr->data + r * width_bytes, s + r * spitch, width_bytes);
    return 0;
}
inline int cudaFreeArray(cudaArray_t arr) {
    if (arr) { std::free(arr->data); delete arr; }
    return 0;
}

enum cudaResourceType { cudaResourceTypeArray = 0 };
struct cudaResourceDesc {
    cudaResourceType resType;
    struct { struct { cudaArray_t array; } array; } res;
};
enum cudaTextureAddressMode { cudaAddressModeClamp = 0 };
enum cudaTextureFilterMode { cudaFilterModePoint = 0 };
enum cudaTextureReadMode { cudaReadModeElementType = 0 };
struct cudaTextureDesc {
    cudaTextureAddressMode addressMode[3];
    cudaTextureFilterMode filterMode;
    cudaTextureReadMode readMode;
    int normalizedCoords;
};
inline int cudaCreateTextureObject(cudaTextureObject_t* obj,
                                   const cudaResourceDesc* res,
                                   const cudaTextureDesc*, void*) {
    *obj = res->res.array.array;
    return 0;
}
inline int cudaDestroyTextureObject(cudaTextureObject_t) { return 0; }

struct float4 { float x, y, z, w; };

inline long _tex_clamp(float c, long n) {
    long i = (long)c;
    if (i < 0) i = 0;
    if (i >= n) i = n - 1;
    return i;
}
template <typename T>
inline T tex1D(cudaTextureObject_t obj, float x) {
    long n = obj->width_elems / 4;  // float4 elements per row
    long i = _tex_clamp(x, n > 0 ? n : 1);
    T out;
    std::memcpy(&out, obj->data + i * 4, sizeof(T));
    return out;
}
template <typename T>
inline T tex2D(cudaTextureObject_t obj, float x, float y) {
    long nx = obj->width_elems / 4;
    long ny = obj->height_rows;
    long ix = _tex_clamp(x, nx > 0 ? nx : 1);
    long iy = _tex_clamp(y, ny > 0 ? ny : 1);
    T out;
    std::memcpy(&out, obj->data + (iy * nx + ix) * 4, sizeof(T));
    return out;
}

// ---- warp intrinsics (inert) ---------------------------------------------
inline unsigned __activemask() { return 0u; }
inline unsigned __ballot_sync(unsigned, int pred) { return pred ? 1u : 0u; }

// ---- launch geometry: serial single-thread semantics ----------------------
struct dim3 {
    unsigned x, y, z;
    dim3(unsigned x_ = 1, unsigned y_ = 1, unsigned z_ = 1) : x(x_), y(y_), z(z_) {}
};
static const dim3 threadIdx{0, 0, 0};
static const dim3 blockIdx{0, 0, 0};
static const dim3 blockDim{1, 1, 1};
static const dim3 gridDim{1, 1, 1};

// nvcc's runtime headers inject float/double ::abs overloads into the global
// namespace (crt/math_functions.h); without these, the reference's unqualified
// ``abs(float)`` in geometry.h would silently truncate through ::abs(int).
inline float abs(float a) { return a < 0.0f ? -a : a; }
inline double abs(double a) { return a < 0.0 ? -a : a; }

// nvcc exposes unqualified host/device max/min.
inline float max(float a, float b) { return a > b ? a : b; }
inline float min(float a, float b) { return a < b ? a : b; }
inline double max(double a, double b) { return a > b ? a : b; }
inline double min(double a, double b) { return a < b ? a : b; }
inline int max(int a, int b) { return a > b ? a : b; }
inline int min(int a, int b) { return a < b ? a : b; }
