"""C API shim build support.

``build_capi()`` compiles ``capi.c`` (CPython-embedding C bindings, see
``dbcsr_tpu.h``) into a shared library next to the source, lazily and
hash-cached like the native planner (``native/__init__.py``). C/Fortran
applications link against the resulting library and include
``dbcsr_tpu.h`` — the analog of linking the reference's ``libdbcsr_c``
(``src/dbcsr.h`` + ``src/dbcsr_api_c.F``).
"""
from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig
from typing import Optional

__all__ = ["build_capi", "header_path"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "capi.c")
_HDR = os.path.join(_HERE, "dbcsr_tpu.h")


def header_path() -> str:
    return _HDR


def build_capi(cc: str = "gcc") -> Optional[str]:
    """Compile the shim; returns the .so path (cached) or None if no
    compiler / no shared libpython is available."""
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION"
    )
    if not (libdir and ver):
        return None
    # cache key covers ALL translation units (capi.c #includes capi2/3.c),
    # the header, AND the Python ABI it embeds, so any source change or a
    # different interpreter triggers a rebuild
    h = hashlib.sha256()
    for part in ("capi.c", "capi2.c", "capi3.c", "dbcsr_tpu.h"):
        with open(os.path.join(_HERE, part), "rb") as f:
            h.update(f.read())
    h.update(f"|{ver}|{libdir}".encode())
    tag = h.hexdigest()[:12]
    so = os.path.join(_HERE, f"_capi_{tag}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = [
        cc, "-O2", "-shared", "-fPIC", f"-I{inc}", f"-I{_HERE}", _SRC,
        "-o", tmp, f"-L{libdir}", f"-lpython{ver}", f"-Wl,-rpath,{libdir}",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    except (OSError, subprocess.CalledProcessError):
        if os.path.exists(tmp):
            os.unlink(tmp)
        return None
    return so
