"""Guard against shadowed top-level definitions (a broken-refactor symptom:
round 1 shipped pipeline/large_scene.py with every public function defined
twice, so the refactored versions were dead code)."""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "rs_image_segmentation_tpu"


def test_no_duplicate_toplevel_defs():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text())
        seen = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    offenders.append(f"{py.relative_to(PKG.parent)}:"
                                     f"{node.lineno} re-defines {node.name} "
                                     f"(first at :{seen[node.name]})")
                seen[node.name] = node.lineno
    assert not offenders, "\n".join(offenders)
