"""Unified CLI dispatcher (python -m mec_tpu <command>).

The reference exposes each task as its own script (reference
README.md:96-201); mec_tpu adds one discoverable front door over the
per-subsystem entry points. These tests pin the dispatch contract:
every advertised command resolves to a module with main(argv), args
pass through verbatim, and unknown commands fail loudly.
"""

import importlib

import pytest

from mec_tpu import __main__ as cli


def test_help_lists_every_command(capsys):
    assert cli.main(['--help']) == 0
    out = capsys.readouterr().out
    for name in cli._COMMANDS:
        assert name in out


def test_no_args_prints_usage_and_fails(capsys):
    # Error-path usage goes to stderr (ADVICE round 2): the empty
    # invocation exits 2, so its usage text must not pollute stdout.
    assert cli.main([]) == 2
    captured = capsys.readouterr()
    assert 'usage:' in captured.err
    assert captured.out == ''


def test_version(capsys):
    import mec_tpu
    assert cli.main(['--version']) == 0
    assert mec_tpu.__version__ in capsys.readouterr().out


def test_unknown_command_exits_2_with_hint(capsys):
    assert cli.main(['train-speach']) == 2
    err = capsys.readouterr().err
    assert 'unknown command' in err and 'train-speech' in err


def test_every_command_module_has_main():
    for name, (mod_path, _help) in cli._COMMANDS.items():
        mod = importlib.import_module(mod_path)
        assert callable(getattr(mod, 'main', None)), (name, mod_path)


def test_dispatch_passes_args_through(monkeypatch):
    seen = {}

    class FakeMod:
        @staticmethod
        def main(argv):
            seen['argv'] = argv
            return 0

    monkeypatch.setattr(importlib, 'import_module',
                        lambda path: FakeMod)
    assert cli.main(['organize', 'all', '--base-dir', '/tmp/x']) == 0
    assert seen['argv'] == ['all', '--base-dir', '/tmp/x']


def test_dispatch_none_return_maps_to_zero(monkeypatch):
    class FakeMod:
        @staticmethod
        def main(argv):
            return None

    monkeypatch.setattr(importlib, 'import_module', lambda path: FakeMod)
    assert cli.main(['serve']) == 0


def test_real_subcommand_help_exits_zero():
    # organize is the lightest real command (no jax compile, no network)
    with pytest.raises(SystemExit) as exc:
        cli.main(['organize', '--help'])
    assert exc.value.code == 0
