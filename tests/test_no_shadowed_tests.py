"""Guard against silently shadowed test definitions (VERDICT r4 weak #3).

Python lets a later ``def test_x`` shadow an earlier one in the same
module; pytest then runs only the survivor and the suite count silently
drops. Two tests in ``test_golden.py`` were lost this way through round
4. This meta-test ASTs every test module and fails on any duplicated
top-level function name (the flake8 F811 condition, without needing
flake8 in the image).
"""
import ast
import collections
import pathlib

TESTS = pathlib.Path(__file__).parent


def test_no_duplicate_toplevel_defs():
    offenders = {}
    for path in sorted(TESTS.glob("test_*.py")):
        tree = ast.parse(path.read_text())
        names = collections.Counter(
            node.name
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        )
        dups = sorted(n for n, c in names.items() if c > 1)
        if dups:
            offenders[path.name] = dups
    assert not offenders, (
        f"shadowed (duplicated) top-level defs: {offenders}"
    )
