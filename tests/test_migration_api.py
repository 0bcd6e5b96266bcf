"""docs/MIGRATION.md names the public API surface a reference user is
pointed at — certify that every dotted ``safelife_tpu.…`` path in the
guide resolves to a real module attribute, so the guide cannot rot as the
package evolves (reference parity map: docs/MIGRATION.md)."""

import importlib
import pathlib
import re

import pytest

GUIDE = pathlib.Path(__file__).parent.parent / "docs" / "MIGRATION.md"

# Dotted paths like `safelife_tpu.env.env.BatchedSafeLifeEnv` inside
# backticks. Trailing () and text after spaces are dropped.
_PATTERN = re.compile(r"`(safelife_tpu(?:\.\w+)+)")


def _paths():
    text = GUIDE.read_text()
    return sorted({m.group(1) for m in _PATTERN.finditer(text)})


@pytest.mark.parametrize("path", _paths())
def test_symbol_resolves(path):
    parts = path.split(".")
    # Longest importable module prefix, then getattr the rest.
    for i in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:i]))
        except ImportError:
            continue
        for attr in parts[i:]:
            assert hasattr(obj, attr), f"{path}: no attribute {attr!r}"
            obj = getattr(obj, attr)
        return
    raise AssertionError(f"no importable prefix for {path}")


def test_guide_names_enough_symbols():
    # A guard that the regex keeps finding the map (guide edits that
    # break the backtick convention would silently skip everything).
    assert len(_paths()) >= 15
