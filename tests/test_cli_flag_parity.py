"""Systematic CLI flag parity vs the reference's argparse definitions.

Extracts every `add_argument` call from the reference entry points with
`ast` (they live under `if __name__ == '__main__'` so they cannot be
imported) and asserts our `build_parser()`s accept the same option strings
with the same defaults and store_true/store_false actions — including the
`--use_attention` store_false quirk (reference train.py:807-808).

Guards against silent flag drift that the functional CLI tests
(test_cli.py) would not notice: a reference user's exact command line must
keep working.
"""
import ast
import os

import pytest

REFERENCE_ROOT = "/root/reference"

# flags whose DEFAULTS intentionally differ (documented reasons); the flag
# itself must still exist and parse. Path-valued reference defaults are
# exempted by rule below: they hard-code the original author's machine
# (e.g. '/home/yating/...', train.py:750-767) or a metric-stamped
# checkpoint filename that only exists after training.
DEFAULT_EXEMPT = {
    # reference pretrain/main.py:18 defaults --phase to 'graphtrain', which
    # is NOT in its own choices list — the reference's bare `python main.py`
    # exits with an argparse error. Ours defaults to a valid phase.
    "--phase",
}


def _is_pathlike(v) -> bool:
    return isinstance(v, str) and ("/" in v or v.endswith(".pth")
                                   or v.endswith(".pkl"))


def _extract_ref_flags(path):
    """[(option_string, {default, action, has_type})] from add_argument
    calls in the file."""
    with open(path) as f:
        tree = ast.parse(f.read())
    out = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            continue
        if not (node.args and isinstance(node.args[0], ast.Constant)):
            continue
        opt = node.args[0].value
        if not (isinstance(opt, str) and opt.startswith("--")):
            continue
        info = {"default": None, "action": None, "has_default": False}
        for kw in node.keywords:
            if kw.arg == "default":
                try:
                    info["default"] = ast.literal_eval(kw.value)
                    info["has_default"] = True
                except ValueError:
                    pass    # computed default; skip value comparison
            elif kw.arg == "action" and isinstance(kw.value, ast.Constant):
                info["action"] = kw.value.value
        out[opt] = info
    return out


def _norm(v):
    """Lists/tuples compare structurally; argparse stores both."""
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _assert_parity(ref_file, build_parser, exempt=()):
    ref_flags = _extract_ref_flags(ref_file)
    assert ref_flags, f"no flags extracted from {ref_file}"
    parser = build_parser()
    ours = {}
    for action in parser._actions:
        for opt in action.option_strings:
            ours[opt] = action

    missing = sorted(set(ref_flags) - set(ours))
    assert not missing, (
        f"reference flags missing from our parser for {ref_file}: "
        f"{missing}")

    mismatches = []
    for opt, info in ref_flags.items():
        action = ours[opt]
        kind = type(action).__name__
        if info["action"] == "store_true" and kind != "_StoreTrueAction":
            mismatches.append(f"{opt}: expected store_true, got {kind}")
        if info["action"] == "store_false" and kind != "_StoreFalseAction":
            mismatches.append(f"{opt}: expected store_false, got {kind}")
        if (info["has_default"] and opt not in DEFAULT_EXEMPT
                and opt not in exempt and info["action"] is None
                and not _is_pathlike(info["default"])):
            if _norm(action.default) != _norm(info["default"]):
                # string-encoded list defaults (reference parses them later
                # with ast.literal_eval, train.py:819-821) count as equal
                # when the parsed values agree, whatever the whitespace
                def ev(v):
                    if isinstance(v, str):
                        try:
                            return ast.literal_eval(v)
                        except (ValueError, SyntaxError):
                            return v
                    return v
                if _norm(ev(action.default)) != _norm(ev(info["default"])):
                    mismatches.append(
                        f"{opt}: default {action.default!r} != reference "
                        f"{info['default']!r}")
    assert not mismatches, "\n".join(mismatches)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference tree not available")
def test_train_cli_flags():
    from gfs3dseg_gws_tpu.cli.train_cli import build_parser
    _assert_parity(os.path.join(REFERENCE_ROOT, "train.py"), build_parser)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference tree not available")
def test_basis_cli_flags():
    from gfs3dseg_gws_tpu.cli.basis_cli import build_parser
    _assert_parity(os.path.join(REFERENCE_ROOT, "get_basis.py"),
                   build_parser)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference tree not available")
def test_pretrain_cli_flags():
    from gfs3dseg_gws_tpu.cli.pretrain_cli import build_parser
    _assert_parity(os.path.join(REFERENCE_ROOT, "pretrain", "main.py"),
                   build_parser)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference tree not available")
def test_room2blocks_cli_flags():
    from gfs3dseg_gws_tpu.cli.preprocess_cli import build_parser

    def room2blocks_parser():
        p = build_parser()
        subs = next(a for a in p._actions
                    if isinstance(a, type(p._subparsers._group_actions[0])))
        return subs.choices["room2blocks"]

    _assert_parity(
        os.path.join(REFERENCE_ROOT, "pretrain", "preprocess",
                     "room2blocks.py"), room2blocks_parser)
