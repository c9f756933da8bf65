"""Static docs builder — render docs/**/*.md into a browsable HTML site.

The reference ships Sphinx + MyST + KaTeX on readthedocs
(/root/reference/docs/source/conf.py:18-28, .readthedocs.yaml). This
environment has no Sphinx, so the pipeline is a small, dependency-light
builder on python-markdown + pygments (both in the base image):

* every ``docs/**/*.md`` → ``docs/_site/**/*.html`` with a shared shell
  (sidebar nav from index.md, light/dark via prefers-color-scheme);
* ``$…$`` / ``$$…$$`` math is protected from the markdown pass and
  rendered client-side by KaTeX (CDN tags, like the reference's
  sphinx.ext.mathjax — no network needed at BUILD time);
* intra-site ``.md`` links rewritten to ``.html``; assets copied.

Usage:  python scripts/build_docs.py [--out docs/_site]
CI publishes the directory as-is (any static host; the reference used
readthedocs).
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

import markdown

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — dmme-tpu</title>
<link rel="stylesheet"
  href="https://cdn.jsdelivr.net/npm/katex@0.16.11/dist/katex.min.css">
<script defer
  src="https://cdn.jsdelivr.net/npm/katex@0.16.11/dist/katex.min.js"></script>
<script defer
  src="https://cdn.jsdelivr.net/npm/katex@0.16.11/dist/contrib/auto-render.min.js"
  onload="renderMathInElement(document.body,
    {{delimiters: [{{left: '$$', right: '$$', display: true}},
                   {{left: '$', right: '$', display: false}}]}});"></script>
<style>
:root {{ color-scheme: light dark;
  --bg: #ffffff; --ink: #1a1a19; --muted: #5f5e56; --line: #e8e6e0;
  --accent: #2a78d6; --code-bg: #f6f5f1; }}
@media (prefers-color-scheme: dark) {{
  :root {{ --bg: #1a1a19; --ink: #f1f0ea; --muted: #c3c2b7;
    --line: #3a3a38; --accent: #3987e5; --code-bg: #242422; }} }}
* {{ box-sizing: border-box; }}
body {{ margin: 0; background: var(--bg); color: var(--ink);
  font: 16px/1.6 system-ui, sans-serif; display: flex; }}
nav {{ width: 240px; min-height: 100vh; padding: 24px 16px;
  border-right: 1px solid var(--line); flex-shrink: 0;
  position: sticky; top: 0; align-self: flex-start; }}
nav a {{ display: block; color: var(--muted); text-decoration: none;
  padding: 3px 8px; border-radius: 6px; font-size: 14px; }}
nav a:hover {{ color: var(--ink); background: var(--code-bg); }}
nav .brand {{ font-weight: 700; color: var(--ink); font-size: 16px;
  margin-bottom: 12px; }}
main {{ max-width: 860px; padding: 32px 40px 80px; min-width: 0; }}
h1, h2, h3 {{ line-height: 1.25; }}
a {{ color: var(--accent); }}
pre {{ background: var(--code-bg); border: 1px solid var(--line);
  border-radius: 8px; padding: 12px 14px; overflow-x: auto;
  font-size: 13.5px; }}
code {{ background: var(--code-bg); border-radius: 4px;
  padding: 1px 4px; font-size: 0.92em; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; display: block; overflow-x: auto; }}
th, td {{ border: 1px solid var(--line); padding: 6px 10px;
  text-align: left; font-size: 14.5px; }}
img {{ max-width: 100%; }}
blockquote {{ border-left: 3px solid var(--line); margin-left: 0;
  padding-left: 16px; color: var(--muted); }}
</style>
</head>
<body>
<nav>
<div class="brand"><a href="{root}index.html"
  style="color:inherit">dmme-tpu</a></div>
{nav}
</nav>
<main>
{body}
</main>
</body>
</html>
"""

NAV_PAGES = [
    ("index.html", "Overview"),
    ("training_demo.html", "Training demo (TPU)"),
    ("architecture.html", "Architecture"),
    ("parallelism.html", "Parallelism"),
    ("performance.html", "Performance"),
    ("evaluation.html", "Evaluation"),
    ("operations.html", "Operations"),
    ("sampling.html", "Sampling"),
    ("latent.html", "Latent diffusion"),
    ("api.html", "API"),
    ("migration.html", "Migration"),
    ("papers/ddpm.html", "· DDPM math"),
    ("papers/ddim.html", "· DDIM math"),
    ("papers/iddpm.html", "· IDDPM math"),
    ("papers/edm.html", "· EDM math"),
    ("papers/progressive_distillation.html", "· Distillation math"),
]

_MATH = re.compile(r"(\$\$.+?\$\$|(?<![\\$])\$(?!\s)[^$\n]+?(?<!\s)\$(?!\d))",
                   re.DOTALL)


def protect_math(text):
    """Swap math spans for placeholders so markdown doesn't mangle the
    underscores/asterisks inside; restored verbatim after conversion for
    KaTeX's client-side pass."""
    spans = []

    def stash(m):
        spans.append(m.group(0))
        return f"QQMATHQQ{len(spans) - 1}QQENDQQ"

    return _MATH.sub(stash, text), spans


def restore_math(html, spans):
    for i, s in enumerate(spans):
        html = html.replace(f"QQMATHQQ{i}QQENDQQ", s)
    return html


def convert(md_text):
    text, spans = protect_math(md_text)
    html = markdown.markdown(
        text,
        extensions=["tables", "fenced_code", "codehilite", "toc"],
        extension_configs={"codehilite": {"noclasses": True, "guess_lang": False}},
    )
    html = restore_math(html, spans)
    # intra-site links: foo.md → foo.html (leave http(s) alone)
    return re.sub(r'href="(?!https?://)([^"#]+)\.md(#[^"]*)?"',
                  r'href="\1.html\2"', html)


def first_heading(md_text, fallback):
    m = re.search(r"^#\s+(.+)$", md_text, re.M)
    return m.group(1) if m else fallback


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="docs")
    ap.add_argument("--out", default="docs/_site")
    args = ap.parse_args()

    pages = []
    for root, _dirs, files in os.walk(args.docs):
        if os.path.abspath(root).startswith(os.path.abspath(args.out)):
            continue
        for f in files:
            if f.endswith(".md"):
                pages.append(os.path.relpath(os.path.join(root, f), args.docs))

    # drift guard (ADVICE r3): every page must be reachable from the sidebar
    nav_hrefs = {href for href, _ in NAV_PAGES}
    missing = [
        p for p in pages
        if p[:-3].replace(os.sep, "/") + ".html" not in nav_hrefs
    ]
    assert not missing, f"pages missing from NAV_PAGES: {missing}"

    os.makedirs(args.out, exist_ok=True)
    for rel in sorted(pages):
        src = os.path.join(args.docs, rel)
        dst = os.path.join(args.out, rel[:-3] + ".html")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        depth = rel.count(os.sep)
        root_prefix = "../" * depth
        with open(src) as fh:
            md_text = fh.read()
        nav = "\n".join(
            f'<a href="{root_prefix}{href}">{label}</a>'
            for href, label in NAV_PAGES
        )
        html = TEMPLATE.format(
            title=first_heading(md_text, rel),
            nav=nav,
            root=root_prefix,
            body=convert(md_text),
        )
        with open(dst, "w") as fh:
            fh.write(html)
        print(dst)

    assets = os.path.join(args.docs, "assets")
    if os.path.isdir(assets):
        shutil.copytree(assets, os.path.join(args.out, "assets"),
                        dirs_exist_ok=True)
        print(os.path.join(args.out, "assets/"))


if __name__ == "__main__":
    main()
