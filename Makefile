# Developer entry points. The native decoder has its own Makefile
# (instageo_tpu/native/Makefile, auto-built lazily on first use).

.PHONY: check test native bench

# Pre-snapshot gate: run the test chunk(s) owning every file touched
# since the last commit (tools/snapshot_check.py). Commit only on GREEN.
check:
	python tools/snapshot_check.py

# Full suite on the 8-device virtual CPU mesh (~25-30 min on 1 core).
test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C instageo_tpu/native

# Headline benchmark (real TPU through the relay).
bench:
	python bench.py
