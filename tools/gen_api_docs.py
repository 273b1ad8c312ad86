"""Generate the API reference (docs/api/*.md) from the package docstrings.

The reference ships a Sphinx autodoc site (/root/reference/docs/source/
conf.py, docs/source/reference/deeprank2.rst); this environment has no
Sphinx, so this is a dependency-free equivalent: walk every module under
``deeprank2_tpu``, introspect its public classes/functions, and render one
markdown page per module plus an index. Wired into CI (.github/workflows)
so the docs regenerate on every push.

    python tools/gen_api_docs.py [--check]

``--check`` regenerates into a temp dir and fails if docs/api is stale.
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PACKAGE = "deeprank2_tpu"


def _clean_doc(doc: str | None, indent: str = "") -> str:
    if not doc:
        return ""
    return "\n".join(indent + line for line in inspect.cleandoc(doc).splitlines())


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _render_function(name: str, fn, heading: str) -> list[str]:
    lines = [f"{heading} `{name}{_signature(fn)}`", ""]
    doc = _clean_doc(inspect.getdoc(fn))
    if doc:
        lines += [doc, ""]
    return lines


def _render_class(name: str, cls) -> list[str]:
    lines = [f"### class `{name}{_signature(cls) if not inspect.isabstract(cls) else ''}`", ""]
    doc = _clean_doc(inspect.getdoc(cls))
    if doc:
        lines += [doc, ""]
    for mname, member in sorted(vars(cls).items()):
        if not _is_public(mname):
            continue
        if inspect.isfunction(member):
            mdoc = inspect.getdoc(member)
            if mdoc:
                lines += [f"- **`{mname}{_signature(member)}`** — {inspect.cleandoc(mdoc).splitlines()[0]}"]
        elif isinstance(member, property) and member.fget and inspect.getdoc(member.fget):
            lines += [f"- *property* **`{mname}`** — {inspect.cleandoc(inspect.getdoc(member.fget)).splitlines()[0]}"]
    if lines[-1] != "":
        lines.append("")
    return lines


def render_module(modname: str) -> str | None:
    try:
        mod = importlib.import_module(modname)
    except Exception as e:  # noqa: BLE001 - optional deps may be absent
        print(f"skip {modname}: {e}", file=sys.stderr)
        return None
    lines = [f"# `{modname}`", ""]
    doc = _clean_doc(mod.__doc__)
    if doc:
        lines += [doc, ""]
    classes, functions = [], []
    for name, obj in sorted(vars(mod).items()):
        if not _is_public(name):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # re-exports are documented at their home module
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))
    if not doc and not classes and not functions:
        return None
    for name, obj in classes:
        lines += _render_class(name, obj)
    for name, obj in functions:
        lines += _render_function(name, obj, "### ")
    return "\n".join(lines).rstrip() + "\n"


def generate(out_dir: Path) -> dict[str, str]:
    pkg = importlib.import_module(PACKAGE)
    pages: dict[str, str] = {}
    modnames = [PACKAGE] + [m.name for m in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + ".")]
    for modname in sorted(modnames):
        if ".csrc" in modname:
            continue
        page = render_module(modname)
        if page:
            pages[modname.replace(".", "/") + ".md"] = page

    index = ["# API reference", "", f"Generated from the `{PACKAGE}` docstrings by `tools/gen_api_docs.py`.", ""]
    for rel in sorted(pages):
        mod = rel[:-3].replace("/", ".")
        first = ""
        for line in pages[rel].splitlines():
            if line and not line.startswith("#"):
                first = line.strip()
                break
        index.append(f"- [`{mod}`]({rel}) — {first}")
    pages["index.md"] = "\n".join(index) + "\n"

    out_dir.mkdir(parents=True, exist_ok=True)
    for rel, content in pages.items():
        path = out_dir / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(content)
    return pages


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--check", action="store_true", help="fail if docs/api is stale")
    args = parser.parse_args()

    out = REPO / "docs" / "api"
    if args.check:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            pages = generate(Path(td))
            stale = []
            for rel, content in pages.items():
                existing = out / rel
                if not existing.exists() or existing.read_text() != content:
                    stale.append(rel)
            extra = [str(p.relative_to(out)) for p in out.rglob("*.md") if str(p.relative_to(out)) not in pages]
            if stale or extra:
                print(f"docs/api is stale: {len(stale)} changed, {len(extra)} orphaned — run python tools/gen_api_docs.py")
                raise SystemExit(1)
            print("docs/api is up to date")
            return
    pages = generate(out)
    print(f"wrote {len(pages)} pages under {out}")


if __name__ == "__main__":
    main()
