"""Examples and tools must at least parse (they are the usage contract)."""
import ast
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = sorted((ROOT / "examples" / "python").glob("*.py")) + \
          sorted((ROOT / "tools").glob("*.py")) + \
          [ROOT / "bench.py", ROOT / "__graft_entry__.py"]


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_parses(path):
    ast.parse(path.read_text(), filename=str(path))
