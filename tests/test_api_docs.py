"""API-doc drift guard — the Documenter-autodocs analogue.

The reference's docs are generated (`/root/reference/docs/make.jl:1-21`)
and cannot drift from the code; `docs/api.md` here is hand-maintained
and HAS drifted before (stale test filename, missing kwargs). This test
extracts every ``### `name(signature)` `` header from docs/api.md and
asserts it matches ``inspect.signature`` of the actual export — names,
order, and kwarg defaults included — so a sampler-signature edit that
doesn't touch the docs fails CI.
"""

import inspect
import re
from pathlib import Path

import pytest

import kissabc_tpu as ka

API_MD = Path(__file__).resolve().parent.parent / "docs" / "api.md"

# Doc-side default text allowed to differ from the runtime default:
# values the docstring states as the formula the runtime computes from
# None (smc.jl's literal defaults), and callables shown by name.
FORMULA_DEFAULTS = {
    "r_epstol": "(1-alpha)**1.5/50",
    "min_r_ess": "alpha**2",
}

HEADER_RE = re.compile(r"^### `(\w+)\((.*)\)(?: -> \w+)?`$")


def _split_toplevel(argstr: str) -> list[str]:
    """Split a signature body on top-level commas (defaults may contain
    parens/brackets, e.g. ``(1-alpha)**1.5/50``)."""
    out, depth, cur = [], 0, []
    for ch in argstr:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [a for a in out if a]


def _norm_default(text: str) -> str:
    """Normalize a default-value literal for comparison: quote style,
    numeric underscores, float-vs-int spellings."""
    t = text.strip().replace('"', "'")
    t = re.sub(r"(?<=\d)_(?=\d)", "", t)
    try:  # 10000 == 10_000 == 1e4; 0.0 == 0.
        return repr(float(t)) if "." in t or "e" in t else repr(int(t))
    except ValueError:
        return t


def _runtime_default(p: inspect.Parameter) -> str:
    d = p.default
    if callable(d) and hasattr(d, "__name__"):
        return d.__name__
    r = repr(d).replace('"', "'")
    try:
        return repr(float(r)) if "." in r or "e" in r else repr(int(r))
    except ValueError:
        return r


def _doc_headers():
    headers = []
    for line in API_MD.read_text().splitlines():
        m = HEADER_RE.match(line.strip())
        if m:
            headers.append((m.group(1), m.group(2)))
    return headers


DOC_HEADERS = _doc_headers()


def test_headers_found():
    names = [n for n, _ in DOC_HEADERS]
    # every user-facing sampler must have a signature header in the docs
    for required in ("sample", "smc", "smc_stepped", "tsmc", "ABCDE",
                     "pfilter", "abc_rejection"):
        assert required in names, f"docs/api.md lost the {required} header"
    assert len(names) == len(set(names)), "duplicate API headers"


@pytest.mark.parametrize("name,docsig", DOC_HEADERS,
                         ids=[n for n, _ in DOC_HEADERS])
def test_doc_signature_matches_runtime(name, docsig):
    fn = getattr(ka, name, None)
    assert fn is not None, f"docs/api.md documents {name}, not exported"
    real = inspect.signature(fn)

    doc_pos, doc_kw, seen_star = [], {}, False
    for entry in _split_toplevel(docsig):
        if entry == "*":
            seen_star = True
            continue
        if "=" in entry:
            k, v = entry.split("=", 1)
            doc_kw[k.strip()] = v.strip()
        elif seen_star:
            doc_kw[entry] = None
        else:
            doc_pos.append(entry)

    real_pos = [p.name for p in real.parameters.values()
                if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                and p.default is p.empty]
    real_pos += ["*" + p.name for p in real.parameters.values()
                 if p.kind == p.VAR_POSITIONAL]
    real_kw = {p.name: p for p in real.parameters.values()
               if p.kind == p.KEYWORD_ONLY
               or (p.kind == p.POSITIONAL_OR_KEYWORD
                   and p.default is not p.empty)}

    assert doc_pos == real_pos, (
        f"{name}: doc positional args {doc_pos} != runtime {real_pos}")
    assert set(doc_kw) == set(real_kw), (
        f"{name}: doc kwargs {sorted(doc_kw)} != runtime "
        f"{sorted(real_kw)} (missing in doc: "
        f"{sorted(set(real_kw) - set(doc_kw))}; stale in doc: "
        f"{sorted(set(doc_kw) - set(real_kw))})")

    for k, doc_val in doc_kw.items():
        if doc_val is None:
            continue
        if FORMULA_DEFAULTS.get(k) == doc_val.replace(" ", ""):
            assert real_kw[k].default is None, (
                f"{name}.{k}: doc shows the derived formula, runtime "
                "default must be the None sentinel")
            continue
        assert _norm_default(doc_val) == _runtime_default(real_kw[k]), (
            f"{name}.{k}: doc default {doc_val!r} != runtime "
            f"{real_kw[k].default!r}")


def test_density_models_params_documented():
    """The density-model constructors are documented as bullets, not
    headers — require every runtime parameter name to appear in the
    Density models section text."""
    text = API_MD.read_text()
    section = text.split("## Density models")[1].split("\n## ")[0]
    for cls in (ka.ApproxPosterior, ka.ApproxKernelizedPosterior,
                ka.CommonLogDensity):
        for p in inspect.signature(cls).parameters.values():
            if p.name == "self":
                continue
            assert p.name in section, (
                f"{cls.__name__} param {p.name!r} undocumented in the "
                "Density models section")
