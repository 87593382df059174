"""Shared trace parsing for the profiling tools — re-exported from the
package's tracing module (fastllama_tpu/utils/trace.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fastllama_tpu.utils.trace import (   # noqa: F401
    device_op_breakdown as load_device_op_breakdown,
    print_breakdown,
)


def build_prompt_tokens(vocab, target_tokens: int) -> str:
    """Build a " wN"-word prompt that tokenizes to >= target_tokens (the
    toy bench vocab byte-tokenizes ~4.3 tokens per word; sizing prompts in
    words silently produced 4x-longer token streams — round-5 finding)."""
    from fastllama_tpu.engine.tokenizer import tokenize
    words = []
    i = 0
    while True:
        words.append(f"w{i % 700}")
        i += 1
        if i % 8 == 0 and len(tokenize(
                vocab, " " + " ".join(words), bos=True)) >= target_tokens:
            return " ".join(words)
