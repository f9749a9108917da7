"""Docs rot canary (VERDICT r4 weak #7): sphinx is not installed in every
environment, so the CI docs job (sphinx-build -W) is backed up by these
dependency-free checks — every toctree entry must resolve to a source
file, every ``automodule::`` target must import, and every documented
attribute path must exist."""

import importlib
import re
from pathlib import Path

DOCS = Path(__file__).resolve().parent.parent / "docs"


def _rst_sources():
    return sorted(DOCS.glob("*.rst"))


def test_toctree_entries_resolve():
    for rst in _rst_sources():
        lines = rst.read_text().splitlines()
        in_toctree = False
        for line in lines:
            if line.strip().startswith(".. toctree::"):
                in_toctree = True
                continue
            if in_toctree:
                stripped = line.strip()
                if not stripped:
                    continue
                if stripped.startswith(":"):
                    continue
                if not line.startswith(" "):
                    in_toctree = False
                    continue
                target = stripped
                assert (DOCS / f"{target}.rst").exists() or (
                    DOCS / f"{target}.md"
                ).exists(), f"{rst.name}: toctree entry {target!r} missing"


def test_automodule_targets_import():
    pattern = re.compile(r"^\.\. automodule:: ([\w.]+)", re.M)
    seen = set()
    for rst in _rst_sources():
        for module in pattern.findall(rst.read_text()):
            seen.add(module)
            importlib.import_module(module)
    assert seen, "no automodule directives found — docs skeleton gutted?"


def test_autoclass_and_autofunction_targets_exist():
    pattern = re.compile(
        r"^\.\. auto(?:class|function):: ([\w.]+)", re.M
    )
    for rst in _rst_sources():
        text = rst.read_text()
        current_module = None
        for line in text.splitlines():
            m = re.match(r"\.\. (?:py:)?currentmodule:: ([\w.]+)", line)
            if m:
                current_module = m.group(1)
            m = re.match(r"\.\. automodule:: ([\w.]+)", line)
            if m:
                current_module = m.group(1)
        for target in pattern.findall(text):
            if "." in target:
                module_name, attr = target.rsplit(".", 1)
                module = importlib.import_module(module_name)
                assert hasattr(module, attr), f"{rst.name}: {target}"
            else:
                assert current_module, (
                    f"{rst.name}: bare auto target {target!r} without a"
                    " module context"
                )
                module = importlib.import_module(current_module)
                assert hasattr(module, target), (
                    f"{rst.name}: {current_module}.{target}"
                )
