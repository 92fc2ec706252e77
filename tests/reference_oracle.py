"""Load pieces of the read-only reference implementation as parity oracles.

The rebuild is written from scratch; these helpers import (not copy) the
reference's torch modules at *test time only* to check numerical parity.
Tests using them skip cleanly when /root/reference is absent.
"""

import ast
import importlib.util
import os

import pytest

REFERENCE = os.environ.get("FEDFR_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


skip_without_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def load_module(relpath: str, name: str):
    """Import a torch-only reference module directly from its file."""
    path = os.path.join(REFERENCE, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_class_source(relpath: str, class_name: str, namespace: dict):
    """Execute a single class definition from a reference file in ``namespace``.

    Used for classes living in files whose imports need mxnet/easydict (e.g.
    client.py's BCE_module); we extract just the class AST and exec it against
    a namespace providing torch/nn/F.
    """
    path = os.path.join(REFERENCE, relpath)
    tree = ast.parse(open(path).read())
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            code = compile(ast.Module(body=[node], type_ignores=[]), path, "exec")
            exec(code, namespace)
            return namespace[class_name]
    raise LookupError(f"{class_name} not found in {relpath}")


def load_function_source(relpath: str, func_name: str, namespace: dict):
    """Execute a single top-level function from a reference file in
    ``namespace`` (e.g. server.py's FedPavg, whose module imports need a GPU
    rig).  Same extraction idea as load_class_source."""
    path = os.path.join(REFERENCE, relpath)
    tree = ast.parse(open(path).read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            code = compile(ast.Module(body=[node], type_ignores=[]), path, "exec")
            exec(code, namespace)
            return namespace[func_name]
    raise LookupError(f"{func_name} not found in {relpath}")
