#!/bin/bash
# Build the reference CPU renderer as a golden-image oracle.
# Sources come read-only from /root/reference; CUDA/SDL/rapidjson are satisfied
# by the clean-room stubs in ./stubs (GPU code compiles but never runs).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference
OUT=${1:-./reforacle}

# Kernel-launch syntax (<<<grid, block>>>) is not C++; rewrite launches into
# plain serial calls (grid/block dims are all 1 in the stub, so grid-stride
# loops execute correctly single-threaded).  Transformed copies live in a temp
# build dir; /root/reference itself is never modified.
BUILDDIR=$(mktemp -d)
trap 'rm -rf "$BUILDDIR"' EXIT
preprocess() {
    local src=$1
    local out="$BUILDDIR/$(basename "$src").cc"
    # Second sed: under single-thread emulation only the <BVH_THREADS*2 branch of
    # build_bvh (bvh.cu:65-73) executes correctly (one call covers every level);
    # raise the threshold so it is taken for any world size.  No behavioral
    # change on real CUDA semantics — both branches build the same tree.
    sed -e 's/<<<[^>]*>>>//g' \
        -e 's/const int BVH_THREADS = 512;/const int BVH_THREADS = 1 << 28;/' \
        "$src" > "$out"
    echo "$out"
}

SRCS=(
    "$REF/src/raytracer.cc"
    "$REF/src/raytracer.cu"
    "$REF/src/rayenv/scene.cc"
    "$REF/src/rayenv/scene.cu"
    "$REF/src/rayenv/canvas.cu"
    "$REF/src/rayenv/camera.cu"
    "$REF/src/rayenv/color.cu"
    "$REF/src/rayprimitives/entity.cu"
    "$REF/src/rayprimitives/hitable.cu"
    "$REF/src/rayprimitives/trimesh.cu"
    "$REF/src/rayprimitives/vertex_buffer.cu"
    "$REF/src/rayprimitives/texture.cu"
    "$REF/src/rayprimitives/light.cu"
    "$REF/src/rayprimitives/phong.cu"
    "$REF/src/rayprimitives/material.cc"
    "$REF/src/rayopt/bounding_box.cu"
    "$REF/src/rayopt/z_order.cu"
    "$REF/src/rayopt/bvh.cc"
    "$REF/src/rayopt/bvh.cu"
    "$REF/src/gputils/alloc.cu"
    "$REF/src/scene_builder.cc"
    "$REF/src/scene_builder.cu"
    "$REF/src/assets.cc"
    "$REF/src/procedural/cube_world.cc"
    "$REF/src/procedural/perlin.cu"
    main.cc
)

PP_SRCS=()
for s in "${SRCS[@]}"; do
    PP_SRCS+=("$(preprocess "$s")")
done

g++ -O2 -std=c++14 -x c++ \
    -I ./stubs -I "$REF/include" -I "$REF/lib" \
    -include cstdio -include climits -include cuda_runtime.h \
    -o "$OUT" "${PP_SRCS[@]}" -lpng -lz -w
echo "built $OUT"
