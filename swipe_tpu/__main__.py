"""Entry point: python -m swipe_tpu [options]."""

import sys

from .cli import main

sys.exit(main())
