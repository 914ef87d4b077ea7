"""The examples/ directory stays green: the end-to-end worked example runs and
its built-in verification passes (it is documentation that cannot rot)."""


def test_end_to_end_example(tmp_path):
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "kwave_example", os.path.join(root, "examples", "end_to_end.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main(str(tmp_path / "ex")) == 0
