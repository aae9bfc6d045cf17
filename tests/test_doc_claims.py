"""Doc-claims lint: every artifact path cited in the round/status/baseline
docs must exist, and no literal PLACEHOLDER strings may ship.

Round 4 shipped ROUND4.md with two unfilled `PLACEHOLDER_*` template
strings and citations to artifacts (docs/demo_r4_curves.png, a demo
README section) that did not exist. This test makes that class of
claims-without-evidence failure impossible to commit silently.

Scope: ROUND*.md, STATUS.md, BASELINE.md, README.md, demo/README.md and
docs/*.md. A cited token is checked when it looks like a repo-relative
path (first segment is a known repo/package directory, or it names a
top-level repo file). Globs must match at least one file. Paths into
/root/reference are checked only when that tree is present (the repo
must stay standalone).
"""

from __future__ import annotations

import glob as globmod
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "lunaris_orion_tpu"
REFERENCE = Path("/root/reference")

DOCS = (
    sorted(REPO.glob("ROUND*.md"))
    + [REPO / "STATUS.md", REPO / "BASELINE.md", REPO / "README.md",
       REPO / "demo" / "README.md"]
    + sorted((REPO / "docs").glob("*.md"))
)

# First path segments that mark a token as a checkable repo path.
REPO_DIRS = {"docs", "demo", "tools", "tests", "lunaris_orion_tpu", "cli"}
# Package-relative citations ("train/loop.py" == lunaris_orion_tpu/train/...).
PKG_DIRS = {"models", "ops", "train", "data", "utils", "parallel", "infer",
            "native", "cli"}
# Bare (no "/") tokens that are checkable top-level repo files. Other bare
# filenames ("latest.pt", "test_ops.py") are prose shorthand — skipped.
TOP_LEVEL = {"bench.py", "__graft_entry__.py", "pyproject.toml",
             "COPYCHECK.json", "PROGRESS.jsonl"}
TOP_LEVEL_PREFIXES = ("BENCH_r", "MULTICHIP_r")

PATH_RE = re.compile(
    r"[A-Za-z0-9_][A-Za-z0-9_./*\-]*\."
    r"(?:py|png|md|json|jsonl|csv|npy|pt|txt|cpp|so|stablehlo)\b")


def _candidates(tok: str):
    """Roots a cited token may resolve against."""
    first = tok.split("/", 1)[0]
    if first in REPO_DIRS:
        yield REPO / tok
    if first in PKG_DIRS:
        yield PKG / tok
    if first == "examples" and REFERENCE.is_dir():
        yield REFERENCE / tok
    if "/" not in tok and (tok in TOP_LEVEL
                           or tok.startswith(TOP_LEVEL_PREFIXES)):
        yield REPO / tok


def _exists(p: Path) -> bool:
    if "*" in str(p):
        return bool(globmod.glob(str(p)))
    return p.exists()


def _cited_paths(doc: Path):
    text = doc.read_text()
    for m in PATH_RE.finditer(text):
        tok = m.group(0).rstrip(".")
        # Strip any :line suffix remnants (regex stops at extension).
        yield tok


@pytest.mark.parametrize("doc", DOCS, ids=lambda d: str(d.relative_to(REPO)))
def test_no_placeholders(doc):
    if not doc.exists():
        pytest.skip(f"{doc} not present")
    text = doc.read_text()
    assert "PLACEHOLDER_" not in text, (
        f"{doc} contains an unfilled PLACEHOLDER_* template string")


@pytest.mark.parametrize("doc", DOCS, ids=lambda d: str(d.relative_to(REPO)))
def test_cited_paths_exist(doc):
    if not doc.exists():
        pytest.skip(f"{doc} not present")
    missing = []
    for tok in _cited_paths(doc):
        roots = list(_candidates(tok))
        if not roots:
            continue  # not a checkable repo path (prose, hypothetical)
        if not any(_exists(p) for p in roots):
            missing.append(tok)
    assert not missing, (
        f"{doc.name} cites paths that do not exist in the repo: "
        f"{sorted(set(missing))}")
