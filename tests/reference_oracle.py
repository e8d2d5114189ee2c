"""AST-surgery loader for the reference pack's pure functions.

The reference modules import ComfyUI hosts (``server``,
``folder_paths``) at module top, so they cannot be imported directly.
Following the reference's own test technique (SURVEY.md §4.1: parse the
file, extract only the needed defs, exec into a synthetic namespace),
this loader turns named functions/constants from a reference file into
callables we can fuzz against the framework's re-derivations.

PUBLIC UNTRUSTED CONTENT caveat: only function/assignment bodies for
explicitly named symbols are executed, never module top-level code.
"""

import ast
import os

REFERENCE_ROOT = os.environ.get("VRGDG_REFERENCE", "/root/reference")


def load_reference(filename, names, extra_globals=None, within=None):
    """Exec the named top-level functions/constants from a reference
    module into a fresh namespace and return it as a dict.

    ``within`` names an enclosing top-level function whose *body* is
    searched instead of the module body — several reference modules
    (e.g. ``LTXLoraTrain.py``) define their whole helper layer inside a
    route-registrar closure; the helpers only reference each other and
    module globals, so hoisting them into one namespace preserves
    behavior."""
    path = os.path.join(REFERENCE_ROOT, filename)
    with open(path, "r", encoding="utf-8") as handle:
        tree = ast.parse(handle.read(), filename=path)
    body = tree.body
    if within is not None:
        enclosing = [node for node in tree.body
                     if isinstance(node, (ast.FunctionDef,
                                          ast.AsyncFunctionDef))
                     and node.name == within]
        if not enclosing:
            raise AssertionError(
                f"enclosing function {within} not found in {filename}")
        body = enclosing[0].body
    wanted = set(names)
    picked = []
    for node in body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)) and node.name in wanted:
            picked.append(node)
        elif isinstance(node, ast.Assign):
            targets = [target.id for target in node.targets
                       if isinstance(target, ast.Name)]
            if any(name in wanted for name in targets):
                picked.append(node)
    found = {node.name for node in picked
             if isinstance(node, (ast.FunctionDef, ast.ClassDef))}
    found |= {target.id for node in picked
              if isinstance(node, ast.Assign)
              for target in node.targets
              if isinstance(target, ast.Name)}
    missing = wanted - found
    if missing:
        raise AssertionError(
            f"reference symbols not found in {filename}: "
            f"{sorted(missing)} — the parity test needs updating")

    import base64
    import json
    import math
    import re
    import shutil
    import tempfile
    import time
    from datetime import datetime

    namespace = {"json": json, "re": re, "os": os, "math": math,
                 "time": time, "datetime": datetime, "base64": base64,
                 "shutil": shutil, "tempfile": tempfile}
    namespace.update(extra_globals or {})
    module = ast.Module(body=picked, type_ignores=[])
    exec(compile(module, path, "exec"), namespace)  # noqa: S102
    return namespace
