# Test lanes.
#
# `make test` is the default fast lane for iteration: it deselects the
# @pytest.mark.slow tests (the two 600-step overfit learning tests and the
# 2-process multi-host tests).  Measured 2026-08-19 on the 1-core sandbox:
# fast lane 147 tests / ~19 min (a multi-core host runs it in a few
# minutes); the slow tests add ~8 min on top.  `make test-all` is the full
# suite CI/the driver runs (`python -m pytest tests/ -x -q`) — keep BOTH
# green.

PY ?= python

.PHONY: test test-all

test:
	$(PY) -m pytest tests/ -x -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -x -q
