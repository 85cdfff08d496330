"""Device-side compute ops: SoA vector math, RNG, intersection, textures,
tonemapping, ray generation, BVH, and Pallas kernels."""
