"""`python -m ptyrad_tpu` entry point (reference src/ptyrad/__main__.py)."""

import sys

from ptyrad_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
