"""Packaged example drivers (reference shape: examples/ at repo root).

The full-pipeline driver lives here so the ``syconn.example`` console
script (setup.py entry point) resolves inside the installed package;
the repo-root ``examples/start.py`` is a thin shim onto
:mod:`syconn_tpu.examples.start`.
"""
