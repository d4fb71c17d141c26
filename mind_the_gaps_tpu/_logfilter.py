"""fd-level filter for one known-cosmetic XLA:CPU log line.

Every load of an XLA:CPU executable from the persistent compilation
cache emits two ERROR lines from ``cpu_aot_loader.cc``::

    Target machine feature +prefer-no-scatter is not  supported on the
    host machine. Machine type used for XLA:CPU compilation doesn't
    match ... This could lead to execution errors such as SIGILL.

even when the artifact was written by the SAME host in the SAME
process configuration (measured 2026-08-20: a fresh cache dir,
written and reloaded on one machine, warns on the reload).  The cause
is upstream: the compile side embeds the model-tuning pseudo-features
``prefer-no-scatter``/``prefer-no-gather`` in the target-machine
feature string, while the loader compares against LLVM host-feature
*detection*, which never reports tuning pseudo-features — so the two
can never match and the warning is unconditional noise.  No XLA flag
removes the pseudo-features (``--xla_cpu_max_isa`` only caps real
ISAs).

The filter below drops exactly those lines at the file-descriptor
level (glog writes to fd 2 directly, so Python-level stderr wrapping
cannot catch it).  Lines reporting a mismatch of any REAL feature
(``+avx512f`` …) name that feature in the same position and pass
through untouched — a genuine cross-ISA load still warns.  Disable
with ``MTG_TPU_NO_LOG_FILTER=1``.
"""
from __future__ import annotations

import os
import re
import threading

_SPAM = re.compile(
    rb"cpu_aot_loader[^\n]*Target machine feature "
    rb"\+prefer-no-(?:scatter|gather) is not"
)

_installed = False


def install() -> None:
    """Interpose a line filter on fd 2 (idempotent, thread-safe enough
    for import time).  A daemon thread relays everything except the
    pseudo-feature mismatch lines to the original stderr."""
    global _installed
    if _installed or os.environ.get("MTG_TPU_NO_LOG_FILTER", "0") == "1":
        return
    try:
        orig = os.dup(2)
        r, w = os.pipe()
        os.set_inheritable(orig, False)
        os.dup2(w, 2)
        os.close(w)
    except OSError:  # no real fd 2 (embedded interpreter, ...)
        return
    _installed = True

    def pump():
        buf = b""
        while True:
            try:
                chunk = os.read(r, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            out = b"".join(
                ln + b"\n" for ln in lines if not _SPAM.search(ln)
            )
            # a trailing partial is held only when it looks like the
            # start of a real line; progress-bar output (\r, no \n) and
            # newline-free chunks flush straight through
            if buf and (not lines or b"\r" in buf):
                out, buf = out + buf, b""
            if out:
                try:
                    os.write(orig, out)
                except OSError:
                    break

    threading.Thread(target=pump, name="mtg-logfilter", daemon=True).start()
