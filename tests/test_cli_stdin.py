"""CLI stdin + interactive prompt actions."""

import io

from daam_tpu.run import generate as gen_cli


def test_stdin_action(tmp_path, monkeypatch):
    monkeypatch.setattr('sys.stdin', io.StringIO('a dog\na cat\n'))
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'stdin', '--tiny', '-n', '1', '-o', str(out)])
    subdirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    assert subdirs == ['0', '1']
    assert (out / '0' / 'prompt.txt').read_text() == 'a dog'


def test_prompt_action(tmp_path, monkeypatch):
    monkeypatch.setattr('builtins.input', lambda *a: 'a bird flies')
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'prompt', '--tiny', '-n', '1', '-o', str(out)])
    assert (out / 'prompt' / 'prompt.txt').read_text() == 'a bird flies'
