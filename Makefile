# Repo maintenance targets.

.PHONY: native test test-fast cache-clean

native:
	$(MAKE) -C native

test-fast:
	python -m pytest tests/ -q -m "not slow"

test:
	python -m pytest tests/ -q

# .xla_cache policy: committed entries are the driver's cold-start warm
# cache for the CPU dryrun/compile checks (TPU compiles go through the
# tunnel and do not populate it). New generations appear whenever a
# dryrun-path program changes; commit the fresh entries with the change
# that produced them and drop superseded ones here so driver artifacts
# stay readable.
cache-clean:
	git clean -f .xla_cache
