"""``python -m entreepy_tpu`` — the entreepy-compatible CLI."""

import sys

from .cli import main

sys.exit(main())
