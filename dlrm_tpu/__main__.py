"""``python -m dlrm_tpu`` entry point."""

import sys

from dlrm_tpu.run import main

sys.exit(main())
