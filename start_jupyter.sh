#!/usr/bin/env bash
# Launch a Jupyter lab with the templates directory as the working tree
# (equivalent of the reference's start_jupyter.sh).
cd "$(dirname "$0")"
jupyter lab --ip=0.0.0.0 --no-browser --notebook-dir=templates "$@"
