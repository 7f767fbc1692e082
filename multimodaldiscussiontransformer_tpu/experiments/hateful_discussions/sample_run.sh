#!/bin/bash
# The canonical published configuration (reference sample_run.sh:3).
bash "$(dirname "$0")/run_train.sh" 8 4 5 2 2 0
