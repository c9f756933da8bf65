"""The static docs pipeline builds the real docs tree (reference parity:
Sphinx+KaTeX on readthedocs — here scripts/build_docs.py)."""

import os

import pytest

pytest.importorskip("markdown")

from scripts.build_docs import main as build_docs


def test_site_builds(tmp_path, monkeypatch, capsys):
    build_docs_argv = ["--out", str(tmp_path / "_site")]
    import sys

    monkeypatch.setattr(sys, "argv", ["build_docs.py"] + build_docs_argv)
    build_docs()
    site = tmp_path / "_site"
    assert (site / "index.html").exists()
    assert (site / "papers" / "ddpm.html").exists()
    html = (site / "papers" / "ddpm.html").read_text()
    # math survives the markdown pass verbatim for KaTeX's client pass
    assert "$$" in html and "QQMATH" not in html
    idx = (site / "index.html").read_text()
    assert 'href="architecture.html"' in idx  # .md links rewritten
    # nav paths resolve from nested pages
    nested = (site / "papers" / "ddim.html").read_text()
    assert '../index.html' in nested
