"""Load individual pure-Python functions/classes out of the reference
source by AST extraction, so golden tests can cross-check our operators
against the REAL reference code without importing its package (which
needs bs4/playwright/OpenSSL not present in this sandbox).

Only stdlib-dependent defs are extractable; the loader execs the chosen
nodes in a namespace pre-seeded with the stdlib modules the reference
files use at function scope.
"""

from __future__ import annotations

import ast
import ctypes
import math
import re
import fnmatch
from abc import ABC, abstractmethod
from array import array
from collections import defaultdict
from dataclasses import dataclass, field
import logging
import weakref
from functools import lru_cache
from typing import Pattern
from urllib.parse import parse_qs, parse_qsl, urlencode, urljoin, urlparse, urlunparse

REF = "/root/reference/crawl4ai"

_BASE_GLOBALS = {
    "re": re,
    "math": math,
    "fnmatch": fnmatch,
    "ABC": ABC,
    "abstractmethod": abstractmethod,
    "ctypes": ctypes,
    "array": array,
    "defaultdict": defaultdict,
    "dataclass": dataclass,
    "field": field,
    "logging": logging,
    "weakref": weakref,
    "lru_cache": lru_cache,
    "Pattern": Pattern,
    "urljoin": urljoin,
    "urlparse": urlparse,
    "urlunparse": urlunparse,
    "parse_qs": parse_qs,
    "parse_qsl": parse_qsl,
    "urlencode": urlencode,
    "Optional": object,  # typing names used in annotations only
    "List": list,
    "Dict": dict,
    "Union": object,
    "Set": set,
    "Tuple": tuple,
}


# Decorators and default-argument expressions on an extracted def execute
# arbitrary code from the (untrusted) reference tree the moment the def is
# exec'd.  The name allowlist alone doesn't cover that, so extracted nodes
# are sanitized: decorators are restricted to a tiny benign set (stripped
# otherwise — our call sites invoke the plain functions), and defaults must
# be built from value-only AST nodes (no Call/Attribute/comprehension).
_SAFE_DECORATORS = {"staticmethod", "classmethod", "property", "abstractmethod", "lru_cache"}

_SAFE_DEFAULT_NODES = (
    ast.Constant, ast.Tuple, ast.List, ast.Dict, ast.Set,
    ast.UnaryOp, ast.USub, ast.UAdd, ast.BinOp, ast.Add, ast.Sub, ast.Mult,
    ast.Name, ast.Load,
)


def _sanitize(node) -> None:
    """Strip unsafe decorators; reject non-literal defaults (recursively
    for class bodies)."""
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        kept = []
        for d in node.decorator_list:
            name = d.id if isinstance(d, ast.Name) else None
            if name in _SAFE_DECORATORS:
                kept.append(d)
            elif isinstance(d, ast.Call) and isinstance(d.func, ast.Name) and d.func.id in _SAFE_DECORATORS:
                kept.append(d)  # e.g. @lru_cache(maxsize=...) with literal args
        node.decorator_list = kept
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
        for d in list(node.args.defaults) + [x for x in node.args.kw_defaults if x is not None]:
            for sub in ast.walk(d):
                if not isinstance(sub, _SAFE_DEFAULT_NODES):
                    raise ValueError(
                        f"refusing to extract {node.name}: non-literal default "
                        f"({type(sub).__name__}) would execute reference code at def time"
                    )
    if isinstance(node, ast.ClassDef):
        for item in node.body:
            if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                _sanitize(item)


def load_defs(
    rel_path: str, names: list[str], extra: dict | None = None, consts: list[str] | None = None
) -> dict:
    """Extract top-level functions/classes ``names`` (plus module-level
    constant assignments ``consts``) from the reference file and exec
    them. Returns {name: object}."""
    src = open(f"{REF}/{rel_path}").read()
    tree = ast.parse(src)
    wanted = []
    for n in tree.body:
        if isinstance(n, ast.Assign) and consts:
            targets = {t.id for t in n.targets if isinstance(t, ast.Name)}
            if targets & set(consts):
                wanted.append(n)
        elif (
            isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
            and n.name in names
        ):
            wanted.append(n)
    missing = set(names) - {n.name for n in wanted if hasattr(n, "name")}
    if missing:
        raise KeyError(f"{rel_path}: defs not found: {missing}")
    for n in wanted:
        _sanitize(n)
    mod = ast.Module(body=wanted, type_ignores=[])
    ns = dict(_BASE_GLOBALS)
    ns.update(extra or {})
    exec(compile(mod, f"{REF}/{rel_path}", "exec"), ns)
    return {n: ns[n] for n in names}


def load_method(rel_path: str, class_name: str, method: str, extra: dict | None = None):
    """Extract one method from a class and exec it as a standalone
    function (callers pass ``None`` for self when it is unused)."""
    src = open(f"{REF}/{rel_path}").read()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)) and item.name == method:
                    _sanitize(item)
                    mod = ast.Module(body=[item], type_ignores=[])
                    ns = dict(_BASE_GLOBALS)
                    ns.update(extra or {})
                    exec(compile(mod, f"{REF}/{rel_path}", "exec"), ns)
                    return ns[method]
    raise KeyError(f"{rel_path}: {class_name}.{method} not found")
