"""Native (C++) runtime components, bound via ctypes.

Currently: the binned-SAH BVH builder (``bvh_builder.cpp``), compiled on
demand with the system toolchain and cached next to the source.  Everything
has a pure-numpy fallback, so the framework never *requires* a compiler at
runtime — native code is a fast path, not a dependency.
"""

from .build import load_bvh_builder  # noqa: F401
