"""Executor-side kernels must pickle BY VALUE.

cloudpickle serializes a module-level function as a REFERENCE that the
Python worker re-imports; workers share the driver's CWD but not its
sys.path, so any kernel referencing this package by name dies with
ModuleNotFoundError the moment the driver runs from outside the repo
root (bit three operators before round 5's fresh-process sweep:
simhash64, the multimodal fakes, the stateful update function). Nested
defs/closures pickle by value and are immune.

This test makes the rule structural: no module-level ``pandas_udf``
decorations, and no module-level function passed to
mapInPandas / applyInPandas / applyInPandasWithState / mapPartitions /
foreach / foreachPartition anywhere in the package. (foreachBatch is
exempt — it runs on the DRIVER via the py4j callback server, never
pickled to workers.)
"""

from __future__ import annotations

import ast
import glob
import os

_PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "example_cdk_dynamodb_stream_to_redshift_spark",
)

_EXECUTOR_APIS = {
    "mapInPandas",
    "applyInPandas",
    "applyInPandasWithState",
    "mapPartitions",
    "foreach",
    "foreachPartition",
}


def _module_files():
    return sorted(glob.glob(os.path.join(_PKG, "**", "*.py"), recursive=True))


def _is_pandas_udf(dec: ast.expr) -> bool:
    target = dec.func if isinstance(dec, ast.Call) else dec
    if isinstance(target, ast.Attribute):
        return target.attr == "pandas_udf"
    return isinstance(target, ast.Name) and target.id == "pandas_udf"


def test_no_module_level_pandas_udf():
    offenders = []
    for path in _module_files():
        tree = ast.parse(open(path).read())
        for node in tree.body:  # top level only: nested defs are safe
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if any(_is_pandas_udf(d) for d in node.decorator_list):
                    offenders.append(f"{path}:{node.lineno} {node.name}")
    assert not offenders, (
        "module-level pandas_udf pickles by reference (ModuleNotFoundError "
        f"on workers outside the repo root) — wrap in a factory: {offenders}"
    )


def test_no_module_level_function_passed_to_executor_api():
    offenders = []
    for path in _module_files():
        tree = ast.parse(open(path).read())
        top_level_fns = {
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in _EXECUTOR_APIS
            ):
                continue
            for arg in node.args:
                if isinstance(arg, ast.Name) and arg.id in top_level_fns:
                    offenders.append(f"{path}:{node.lineno} {arg.id}")
    assert not offenders, (
        "module-level function passed to an executor-side API — pickles by "
        f"reference; use a nested def/factory instead: {offenders}"
    )


def test_executor_kernels_do_not_reference_module_level_functions():
    """The TRANSITIVE shape of the same bug: a nested kernel passed to
    an executor API is itself pickled by value, but any module-level
    function it references rides along as a module REFERENCE — same
    ModuleNotFoundError on workers outside the repo root. Caught live
    by the round-9 foreign-CWD drive (packing's _pack_shard closing
    over a module-level _ffd_assign); the fix is the simhash factory
    pattern (define the helper as a nested def, or bind the
    module-level name to a factory-produced closure, whose
    ``<locals>`` qualname forces by-value pickling)."""
    offenders = []
    for path in _module_files():
        tree = ast.parse(open(path).read())
        # names defined as PLAIN module-level defs (importable ->
        # pickled by reference). Names rebound by assignment (the
        # factory pattern `x = _make_x()`) produce <locals> closures
        # and are safe, so exclude them.
        assigned = {
            t.id
            for n in tree.body
            if isinstance(n, ast.Assign)
            for t in n.targets
            if isinstance(t, ast.Name)
        }
        top_level_fns = {
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        } - assigned
        # every function definition in the file, by name (innermost wins
        # is fine for this lint)
        fn_defs = {
            n.name: n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in _EXECUTOR_APIS
            ):
                continue
            for arg in node.args:
                if not (isinstance(arg, ast.Name) and arg.id in fn_defs):
                    continue
                kernel = fn_defs[arg.id]
                refs = {
                    m.id
                    for m in ast.walk(kernel)
                    if isinstance(m, ast.Name) and isinstance(m.ctx, ast.Load)
                }
                for bad in sorted(refs & top_level_fns):
                    offenders.append(
                        f"{path}:{kernel.lineno} {arg.id} references "
                        f"module-level function {bad}"
                    )
    assert not offenders, (
        "executor-side kernel references a module-level function — the "
        "reference pickles by module name and dies on workers outside "
        f"the repo root; use the factory pattern: {offenders}"
    )
