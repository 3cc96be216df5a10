"""PARITY.md is the judge-facing component map; every repo path it cites
must exist (guards against code moves silently orphaning the map)."""

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_parity_paths_exist():
    text = (REPO / "PARITY.md").read_text()
    paths = set(re.findall(r"`((?:libdogleg_tpu|tests|docs)/[\w./-]+)`",
                           text))
    paths |= set(re.findall(r"`(bench[\w.]*\.py|check\.sh|pyproject\.toml)`",
                            text))
    missing = [p for p in sorted(paths) if not (REPO / p).exists()]
    assert not missing, f"PARITY.md cites missing paths: {missing}"


def _resolve_dotted(dotted):
    """Resolve a (possibly partially-qualified) dotted name against the
    package. Returns "ok" if it resolves, "missing" if its first segment
    names something in the package but a later attribute is absent (docs
    drift), "external" if the first segment is not ours (jax.*, dogleg.c
    line cites, ...)."""
    import importlib

    bases = ["libdogleg_tpu", "libdogleg_tpu.ops", "libdogleg_tpu.models",
             "libdogleg_tpu.utils", "libdogleg_tpu.parallel",
             "libdogleg_tpu.analysis"]
    parts = dotted.strip(".").split(".")
    if parts[0] == "libdogleg_tpu":
        parts = parts[1:]
        bases = ["libdogleg_tpu"]
        if not parts:
            return "ok"
    first_seen = False
    for base in bases:
        obj = importlib.import_module(base)
        path = base
        ok = True
        for i, part in enumerate(parts):
            if hasattr(obj, part):
                obj = getattr(obj, part)
            else:
                try:
                    obj = importlib.import_module(f"{path}.{part}")
                except ImportError:
                    if i > 0:
                        first_seen = True
                    ok = False
                    break
            path = f"{path}.{part}"
            if i == 0:
                first_seen = True
        if ok:
            return "ok"
    return "missing" if first_seen else "external"


def test_api_md_symbols_exist():
    """Every package symbol docs/API.md names must actually exist — an
    import-and-getattr sweep so prose drift (symbols renamed/removed, or
    claims about modules that don't exist) fails the suite."""
    text = (REPO / "docs" / "API.md").read_text()

    missing = []
    # 1) dotted names inside backticks (libdogleg_tpu.x.y, ops.x.y, ...)
    for span in re.findall(r"`([^`]+)`", text):
        for dotted in re.findall(r"\b[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)+", span):
            if re.search(r"\.(c|h|py|md|sh|pod|npz|toml|json|bin)$", dotted):
                continue  # a file name, covered by the path tests
            if _resolve_dotted(dotted) == "missing":
                missing.append(dotted)

    # 2) bare identifiers introduced as API headings or call-form bullets:
    #    must exist at the package root or in a module the doc names.
    import importlib
    doc_modules = {m for m in re.findall(r"`(libdogleg_tpu(?:\.\w+)+)`", text)
                   if _resolve_dotted(m) == "ok"}
    namespaces = [importlib.import_module("libdogleg_tpu")]
    for m in sorted(doc_modules):
        try:
            namespaces.append(importlib.import_module(m))
        except ImportError:
            pass  # dotted attr like libdogleg_tpu.ops.cholesky.factorize_jtj
    idents = set(re.findall(r"^#{2,3} `([A-Za-z_]\w*)[`(]", text, re.M))
    idents |= set(re.findall(r"^- `([A-Za-z_]\w*)\(", text, re.M))
    for name in sorted(idents):
        if not any(hasattr(ns, name) for ns in namespaces):
            missing.append(name)

    assert not missing, f"docs/API.md names missing symbols: {missing}"


def test_readme_layout_paths_exist():
    text = (REPO / "README.md").read_text()
    # the Layout block lists `dir/file` entries one per line
    block = text.split("## Layout")[1]
    for token in re.findall(r"^\s{2}([\w/]+\.py)\b", block, re.M):
        assert (REPO / "libdogleg_tpu" / token).exists() or \
            (REPO / token).exists(), f"README layout cites missing {token}"
