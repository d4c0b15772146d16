# Test lanes.
#
# `make test` is the default fast lane for iteration: it deselects the
# @pytest.mark.slow tests (the two 600-step overfit learning tests and the
# 2-process multi-host tests), keeping the lane well under 10 minutes on a
# 1-core host.  `make test-all` is the full suite CI/the driver runs
# (`python -m pytest tests/ -x -q`) — keep BOTH green.

PY ?= python

.PHONY: test test-all

test:
	$(PY) -m pytest tests/ -x -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -x -q
