"""Tagged stdout logging, matching the reference's ``[i]/[ok]/[warn]/[err]``
console convention (e.g. ``rosbags/bag2csv.py:215,471``)."""

from __future__ import annotations

import sys


def _emit(tag: str, *parts, file=None):
    print(tag, *parts, file=file or sys.stdout, flush=True)


def info(*parts):
    _emit("[i]", *parts)


def ok(*parts):
    _emit("[ok]", *parts)


def warn(*parts):
    _emit("[warn]", *parts)


def err(*parts):
    _emit("[err]", *parts, file=sys.stderr)
