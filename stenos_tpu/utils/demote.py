"""One-shot demotion warnings (VERDICT r3 item 10).

Every graceful-degradation ladder in the package (Pallas -> XLA -> numpy,
device entropy decode -> host libzstd, mesh -> single-chip) must say so the
FIRST time it demotes in a process: a silently demoted kernel looks like a
perf regression with no visible cause (round 3's decode-kernel v4 vanished
from the bench artifact exactly this way). Correctness is unaffected —
the ladders exist on purpose (reference analog: stenos.cpp:681-753's
block -> zstd -> memcpy decompress dispatch) — but the demotion itself is
observable state the operator needs.

Set STENOS_SILENT=1 to suppress (e.g. perf A/B harnesses that demote on
purpose).
"""

import os
import warnings

_seen: set = set()


class DemotionWarning(UserWarning):
    """A compute path demoted to a slower fallback tier."""


def warn_once(key: str, msg: str, exc: BaseException | None = None) -> None:
    """Emit one DemotionWarning per (process, key). `exc` is appended so the
    root cause (e.g. a Mosaic lowering error) survives into the warning."""
    if key in _seen or os.environ.get("STENOS_SILENT"):
        return
    _seen.add(key)
    if exc is not None:
        msg = f"{msg} [{type(exc).__name__}: {exc}]"
    warnings.warn(f"stenos-tpu demotion: {msg}", DemotionWarning,
                  stacklevel=3)
