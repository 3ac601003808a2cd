"""Native (C++) host-side kernels, built on demand with g++ and bound via
ctypes (no pybind11 in this environment)."""

from . import euler_native  # noqa: F401
