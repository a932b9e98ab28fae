"""Native (C++) helpers, loaded via ctypes with lazy on-demand builds.

The shared library is compiled once with the system g++ into the repo cache
directory; if no toolchain is available every caller falls back to the
NumPy implementations (code/gf2.py) transparently.
"""
