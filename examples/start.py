"""Shim onto the packaged full-pipeline driver.

The implementation lives in :mod:`syconn_tpu.examples.start` so the
``syconn.example`` console script works from a pip install; running
``python examples/start.py ...`` from a source checkout is equivalent.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syconn_tpu.examples.start import main

if __name__ == "__main__":
    main()
