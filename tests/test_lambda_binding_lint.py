"""AST lint enforcing the repo's lambda-binding rule (docs/ROUND_NOTES.md,
r06): never reference a COMPUTED Column expression inside an
``F.transform`` / ``F.filter`` / ``F.aggregate`` / ``F.exists`` /
``F.forall`` / ``F.zip_with`` lambda. Spark inlines the expression into
the lambda body, so it is re-evaluated PER ELEMENT — five O(n²)–O(n³)
blowups in r06 came from exactly this (e.g. a shingle lambda re-deriving
``F.split(text)`` per element: 388s → 1.9s once bound).

The safe pattern is to bind the expression to a lambda variable first::

    F.element_at(F.transform(F.array(expensive_expr), lambda v: ...), 1)

What this lint flags: inside a lambda passed to one of the HOFs above, a
``Name`` load that was assigned — in the same enclosing Python function —
from an expression containing an ``F.<something>(...)`` call, unless every
``F.`` call in that assignment is in the cheap allowlist (``F.col`` /
``F.lit`` — per-element re-evaluation of a field reference or constant is
O(1)). Lambda parameters (and parameters of enclosing lambdas) are always
fine. Python-function parameters are not tracked (the binding pattern
passes bound lambda vars through helper-function params — the call site is
where the rule is enforced).

This is a heuristic tripwire, not a proof: it catches the exact shape all
five r06 bugs had. If it fires on genuinely-cheap code, bind the value
anyway (uniformity is the point of the rule) or extend _CHEAP_F_CALLS with
a comment.
"""

from __future__ import annotations

import ast
import os

import pytest

_HOFS = {"transform", "filter", "aggregate", "exists", "forall", "zip_with", "reduce"}
_CHEAP_F_CALLS = {"col", "lit"}

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vectorchord_spark")


def _f_calls(node: ast.AST) -> list[str]:
    """Names of all F.<name>(...) calls anywhere under node."""
    out = []
    for n in ast.walk(node):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and isinstance(n.func.value, ast.Name)
            and n.func.value.id == "F"
        ):
            out.append(n.func.attr)
    return out


class _FunctionLinter(ast.NodeVisitor):
    """Lints one Python function body: tracks locals assigned from
    non-cheap F-expressions, then inspects HOF lambdas."""

    def __init__(self, filename: str):
        self.filename = filename
        self.computed: set[str] = set()
        self.lambda_params: list[set[str]] = []
        self.problems: list[str] = []

    # --- do not descend into nested python functions: they get their own
    # linter pass (their locals are a fresh scope) ---
    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        pass

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        pass

    def visit_Assign(self, node: ast.Assign) -> None:
        calls = _f_calls(node.value)
        if calls and any(c not in _CHEAP_F_CALLS for c in calls):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    self.computed.add(t.id)
        self.generic_visit(node)

    def visit_Call(self, node: ast.Call) -> None:
        is_hof = (
            isinstance(node.func, ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"
            and node.func.attr in _HOFS
        )
        if is_hof:
            # non-lambda argument slots (the input array, the init value)
            # are evaluated once per row — only lambda BODIES are checked
            for arg in list(node.args) + [kw.value for kw in node.keywords]:
                if isinstance(arg, ast.Lambda):
                    self._check_lambda(arg)
                else:
                    self.visit(arg)
        else:
            self.generic_visit(node)

    def _check_lambda(self, lam: ast.Lambda) -> None:
        # arity pitfall (round-7 continuation): `lambda s, j=j:` has arity
        # 2, so pyspark's transform binds the ARRAY INDEX to j — the
        # closure default is silently shadowed by a real argument. A
        # default in a HOF lambda is always this broken capture idiom
        # (legitimate 2-ary HOF lambdas take both args for real); close
        # over values with a unary lambda factory instead.
        if lam.args.defaults:
            self.problems.append(
                f"{self.filename}:{lam.lineno}: F-HOF lambda with a "
                f"defaulted parameter — pyspark dispatches on arity, so "
                f"the default is shadowed by the element/index argument; "
                f"close over the value with a factory function instead"
            )
        params = {a.arg for a in lam.args.args}
        self.lambda_params.append(params)
        bound = set().union(*self.lambda_params)
        # manual walk that recurses into nested lambdas WITH the outer
        # params still in scope (a nested HOF lambda may legally reference
        # its enclosing lambda's variables)
        stack: list[ast.AST] = [lam.body]
        while stack:
            n = stack.pop()
            if isinstance(n, ast.Lambda):
                self._check_lambda(n)
                continue
            if (
                isinstance(n, ast.Name)
                and isinstance(n.ctx, ast.Load)
                and n.id in self.computed
                and n.id not in bound
            ):
                self.problems.append(
                    f"{self.filename}:{n.lineno}: computed Column local "
                    f"`{n.id}` referenced inside an F-HOF lambda — Spark "
                    f"re-evaluates it per element; bind it via "
                    f"transform-over-one-element-array first"
                )
            stack.extend(ast.iter_child_nodes(n))
        self.lambda_params.pop()


def _lint_module(path: str) -> list[str]:
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    problems: list[str] = []
    rel = os.path.relpath(path, os.path.dirname(PKG))
    # lint every function scope independently (module top level too)
    scopes: list[ast.AST] = [tree]
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            scopes.append(node)
    for scope in scopes:
        linter = _FunctionLinter(rel)
        body = scope.body if isinstance(scope, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef)) else [scope]
        for stmt in body:
            linter.visit(stmt)
        problems.extend(linter.problems)
    return problems


def _package_py_files() -> list[str]:
    out = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if fn.endswith(".py"):
                out.append(os.path.join(root, fn))
    return sorted(out)


def test_no_computed_columns_inside_hof_lambdas():
    problems: list[str] = []
    for path in _package_py_files():
        problems.extend(_lint_module(path))
    assert not problems, "\n".join(problems)


def test_lint_catches_the_r06_bug_shape():
    """Self-test: the exact shape of the r06 shingles bug must be flagged,
    and the bound rewrite must pass."""
    bad = (
        "def f(text):\n"
        "    w = F.split(text, ' ')\n"
        "    return F.transform(F.sequence(F.lit(1), F.size(w)),\n"
        "                       lambda i: F.element_at(w, i))\n"
    )
    good = (
        "def f(text):\n"
        "    return F.element_at(F.transform(F.array(F.split(text, ' ')),\n"
        "                        lambda w: F.transform(F.sequence(F.lit(1), F.size(w)),\n"
        "                                              lambda i: F.element_at(w, i))), 1)\n"
    )
    cheap = (
        "def f(df):\n"
        "    x = F.col('x')\n"
        "    return F.transform(F.col('arr'), lambda e: e + x)\n"
    )

    def lint_src(src: str) -> list[str]:
        tree = ast.parse(src)
        problems = []
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef):
                linter = _FunctionLinter("<test>")
                for stmt in node.body:
                    linter.visit(stmt)
                problems.extend(linter.problems)
        return problems

    assert lint_src(bad), "the r06 bug shape must be flagged"
    assert not lint_src(good), "the bound rewrite must pass"
    assert not lint_src(cheap), "F.col locals are cheap per-element"

    # arity pitfall: a defaulted param is shadowed by the index argument
    arity_bad = (
        "def f(arr):\n"
        "    return [F.transform(arr, lambda s, j=j: F.md5(s))\n"
        "            for j in range(4)]\n"
    )
    arity_ok = (
        "def f(a, b):\n"
        "    return F.zip_with(a, b, lambda x, y: x + y)\n"
    )
    assert lint_src(arity_bad), "defaulted HOF-lambda param must be flagged"
    assert not lint_src(arity_ok), "real 2-ary HOF lambdas are fine"


if __name__ == "__main__":
    import sys

    all_problems = []
    for p in _package_py_files():
        all_problems.extend(_lint_module(p))
    print("\n".join(all_problems) or "clean")
    sys.exit(1 if all_problems else 0)
