#!/usr/bin/env python
"""Static HTML docs site generator (the L5 docs-site artifact, SURVEY.md §2).

The reference ships a Sphinx site (artbataev.github.io/end2end); this
environment has no sphinx wheel and installs are not allowed, so the site
is generated with the stdlib + the available `markdown` package:

  * every docs/*.md page and the README rendered through one template,
  * an API reference generated from the package's live docstrings
    (modules, public classes/functions, signatures) via `inspect`.

Usage: python docs/build_docs.py [outdir]   (default docs/_site; CI runs
this and uploads the directory as the pages artifact.)
"""

import html
import importlib
import inspect
import os
import pkgutil
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The env var alone is too late on machines whose sitecustomize imports jax
# (the axon TPU plugin would still dial its relay during autodoc imports and
# retry forever if the tunnel is down) — force the platform via the live
# config, exactly like tests/conftest.py does.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import markdown  # noqa: E402

DOCS = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(DOCS)
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(DOCS, "_site")

PAGES = [
    ("index", os.path.join(ROOT, "README.md"), "Overview"),
    ("ctc_math", os.path.join(DOCS, "ctc_math.md"), "CTC math"),
    ("api_guide", os.path.join(DOCS, "api.md"), "API guide"),
    ("migration", os.path.join(DOCS, "migration.md"), "Migrating"),
    ("parallelism", os.path.join(DOCS, "parallelism.md"), "Parallelism"),
    ("perf_roofline", os.path.join(DOCS, "perf_roofline.md"), "Performance"),
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — end2end_tpu</title>
<style>
body {{ font: 16px/1.55 system-ui, sans-serif; margin: 0; color: #1a1a2e; }}
nav {{ background: #14213d; padding: .6rem 1.2rem; }}
nav a {{ color: #e5e8f0; text-decoration: none; margin-right: 1.1rem;
        font-size: .95rem; }}
nav a.active {{ color: #fca311; font-weight: 600; }}
main {{ max-width: 58rem; margin: 0 auto; padding: 1rem 1.2rem 4rem; }}
pre {{ background: #f3f4f8; padding: .8rem 1rem; overflow-x: auto;
      border-radius: 6px; font-size: .88rem; }}
code {{ background: #f3f4f8; padding: .1rem .25rem; border-radius: 3px;
       font-size: .92em; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; font-size: .92rem; }}
th, td {{ border: 1px solid #d6d9e0; padding: .35rem .6rem;
         text-align: left; }}
h1, h2, h3 {{ line-height: 1.25; }}
h2 {{ border-bottom: 1px solid #e2e4ea; padding-bottom: .25rem; }}
.sig {{ background: #eef1f8; border-left: 4px solid #14213d;
       padding: .5rem .8rem; border-radius: 0 6px 6px 0;
       font-family: monospace; font-size: .88rem; white-space: pre-wrap; }}
.docstring {{ margin: .4rem 0 1.4rem .8rem; white-space: pre-wrap;
             font-size: .93rem; }}
.modhead {{ color: #14213d; margin-top: 2.2rem; }}
</style></head><body>
<nav>{nav}</nav>
<main>{body}</main>
</body></html>
"""


def render_nav(active):
    links = [(slug, label) for slug, _, label in PAGES] + [("api", "API reference")]
    return "".join(
        f'<a href="{slug}.html"{" class=\"active\"" if slug == active else ""}>'
        f"{label}</a>"
        for slug, label in links
    )


def render_md(slug, path, label):
    text = open(path, encoding="utf-8").read()
    body = markdown.markdown(
        text, extensions=["tables", "fenced_code", "toc"])
    return TEMPLATE.format(title=label, nav=render_nav(slug), body=body)


def _doc_entry(name, obj):
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        sig = ""
    doc = inspect.getdoc(obj) or ""
    out = [f'<div class="sig" id="{html.escape(name)}">'
           f"{html.escape(name)}{html.escape(sig)}</div>"]
    if doc:
        out.append(f'<div class="docstring">{html.escape(doc)}</div>')
    return "".join(out)


def render_api():
    import end2end_tpu

    parts = ["<h1>API reference</h1>",
             "<p>Generated from the package's live docstrings.</p>"]
    mods = ["end2end_tpu"]
    for _, modname, _ in pkgutil.walk_packages(
            end2end_tpu.__path__, prefix="end2end_tpu."):
        mods.append(modname)
    for modname in sorted(set(mods)):
        try:
            mod = importlib.import_module(modname)
        except Exception as e:  # optional deps (native helper etc.)
            parts.append(f'<h2 class="modhead">{modname}</h2>'
                         f"<p><em>not importable here: "
                         f"{html.escape(str(e))}</em></p>")
            continue
        parts.append(f'<h2 class="modhead">{html.escape(modname)}</h2>')
        mdoc = inspect.getdoc(mod)
        if mdoc:
            first = mdoc.split("\n\n")[0]
            parts.append(
                f'<div class="docstring">{html.escape(first)}</div>')
        names = getattr(mod, "__all__", None) or [
            n for n in vars(mod) if not n.startswith("_")]
        for n in sorted(names):
            obj = vars(mod).get(n)
            if obj is None or inspect.ismodule(obj):
                continue
            if getattr(obj, "__module__", None) != modname:
                continue  # re-exports documented at their home module
            if inspect.isclass(obj):
                parts.append(_doc_entry(n, obj))
                for mn, meth in sorted(vars(obj).items()):
                    if mn.startswith("_") or not callable(meth):
                        continue
                    parts.append(_doc_entry(f"{n}.{mn}", meth))
            elif callable(obj):
                parts.append(_doc_entry(n, obj))
    return TEMPLATE.format(title="API reference", nav=render_nav("api"),
                           body="".join(parts))


def main():
    os.makedirs(OUT, exist_ok=True)
    for slug, path, label in PAGES:
        with open(os.path.join(OUT, f"{slug}.html"), "w",
                  encoding="utf-8") as f:
            f.write(render_md(slug, path, label))
        print(f"wrote {slug}.html")
    with open(os.path.join(OUT, "api.html"), "w", encoding="utf-8") as f:
        f.write(render_api())
    print("wrote api.html")


if __name__ == "__main__":
    main()
