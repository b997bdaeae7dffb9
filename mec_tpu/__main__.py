"""Unified CLI front door: ``python -m mec_tpu <command> [args...]``.

The reference drives each task as a separate script invocation
(``python app.py``, ``python model_training/train_speech_model.py``,
``python organize_datasets.py`` — reference README.md:96-201); here every
subsystem keeps its own ``python -m mec_tpu.<module>`` entry point and
this module adds one discoverable dispatcher over all of them.

Dispatch is lazy: only the selected command's module is imported, so
``--help`` stays instant and a trainer invocation never pays the webapp's
import cost (or vice versa).
"""

from __future__ import annotations

import importlib
import sys
from typing import List, Optional

# command -> (module with main(argv), one-line help)
_COMMANDS = {
    'serve': ('mec_tpu.webapp.serve',
              'run the web service (routes, auth, engine, batcher)'),
    'train-speech': ('mec_tpu.training.train_speech',
                     'train the 5-block speech DNN on a wav tree'),
    'train-text-bert': ('mec_tpu.training.train_text_bert',
                        'fine-tune BERT on a labeled text CSV'),
    'train-text-lstm': ('mec_tpu.training.train_text_lstm',
                        'train the Bi-LSTM text variant'),
    'train-image': ('mec_tpu.training.train_image',
                    'train ResNet50 / MobileNetV2 on an image tree'),
    'train-fusion': ('mec_tpu.training.train_fusion',
                     'train the attention fusion net (synthetic or '
                     '--manifest real triples)'),
    'train-fusion-rf': ('mec_tpu.training.train_fusion_rf',
                        'train the random-forest fusion variant'),
    'convert': ('mec_tpu.convert.__main__',
                'convert reference .h5/.pt/HF-dir/.pkl artifacts to .mecp'),
    'download': ('mec_tpu.datasets.download',
                 'download the Emotions-NLP dataset via Kaggle'),
    'organize': ('mec_tpu.datasets.organize',
                 'reorganize TESS / FER2013 / Emotions-NLP layouts'),
}


def _usage() -> str:
    width = max(len(name) for name in _COMMANDS)
    lines = [f'  {name:<{width}}  {help_}'
             for name, (_mod, help_) in _COMMANDS.items()]
    return ('usage: python -m mec_tpu <command> [args...]\n\n'
            'commands:\n' + '\n'.join(lines) +
            "\n\nRun 'python -m mec_tpu <command> --help' for that "
            "command's arguments.")


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        # Error path (nothing to do): usage goes to stderr, exit 2.
        print(_usage(), file=sys.stderr)
        return 2
    if argv[0] in ('-h', '--help', 'help'):
        print(_usage())
        return 0
    if argv[0] == '--version':
        from mec_tpu import __version__
        print(__version__)
        return 0
    cmd = argv[0]
    entry = _COMMANDS.get(cmd)
    if entry is None:
        close = [n for n in _COMMANDS if n.startswith(cmd.split('-')[0])]
        hint = f" (did you mean: {', '.join(close)}?)" if close else ''
        print(f'mec_tpu: unknown command {cmd!r}{hint}\n\n' + _usage(),
              file=sys.stderr)
        return 2
    mod = importlib.import_module(entry[0])
    rc = mod.main(argv[1:])
    return 0 if rc is None else int(rc)


if __name__ == '__main__':
    sys.exit(main())
