"""Make ``python scripts/<tool>.py`` work from anywhere without PYTHONPATH.

When a script is launched by path, ``sys.path[0]`` is ``scripts/`` — not
the repo root — so ``import dmme_tpu`` fails unless the caller exported
``PYTHONPATH=/path/to/repo``. On the axon box that export is worse than
an inconvenience: PYTHONPATH carries the TPU plugin paths, and replacing
it wholesale silently breaks backend init. Every script therefore does
``import _bootstrap`` as its first import, which prepends the repo root
(this file's parent's parent) exactly once.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
