#!/bin/bash
cd /root/repo
set -e
python scripts/make_full_formulas.py
python build.py --data=configs/data.json --vocab=configs/vocab.json
python scripts/drill_mock_toolchain.py
touch /tmp/r5c_drilldata.done
echo "DRILL DATA DONE $(date -u)"
