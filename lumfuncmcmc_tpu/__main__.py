"""``python -m lumfuncmcmc_tpu`` entry point."""

import sys

from lumfuncmcmc_tpu.cli.main import main

sys.exit(main())
