"""Shared trace parsing for the profiling tools — re-exported from the
package's tracing module (fastllama_tpu/utils/trace.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fastllama_tpu.utils.trace import (   # noqa: F401
    device_op_breakdown as load_device_op_breakdown,
    print_breakdown,
)
