"""Utilities: synthetic corpus, timing, bench table formatting."""

from .corpus import make_corpus

__all__ = ["make_corpus"]
