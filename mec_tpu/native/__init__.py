"""Native (C++) runtime components.

The compute path is JAX/XLA/Pallas; the host-side runtime pieces that the
reference delegates to library-internal native code are authored here in
C++ and bound via ctypes (pybind11 is not in this image):

  * wordpiece.cpp — batch WordPiece encoder (the HF `tokenizers` Rust
    crate's role on the serving hot path).

Libraries build on demand with g++ and cache next to the source; every
native component has a pure-Python reference implementation it is tested
against, and import failures degrade silently to the Python path.
"""

from mec_tpu.native.build import load_library

__all__ = ['load_library']
