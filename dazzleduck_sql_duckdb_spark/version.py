"""Engine version constant.

Parity: reference `dd_version()` returns the extension version string
(/root/reference/src/dazzleduck_extension.cpp:22-36, version.txt:1 -> "0.0.6").
Our engine reports its own version; tests assert shape, not the literal.
"""

ENGINE_VERSION = "0.1.0"
