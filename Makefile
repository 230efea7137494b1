# Repo maintenance targets.

.PHONY: native test test-fast cache-clean

native:
	$(MAKE) -C native

test-fast:
	python -m pytest tests/ -q -m "not slow"

test:
	python -m pytest tests/ -q

# .xla_cache policy: local-only compile cache (gitignored). Committing
# it bought only ~30 s on the driver's ~5.5 min cold dryrun while adding
# 25-81 MB blobs per entry to git history (advisor r3) — regenerated on
# first run instead.
cache-clean:
	rm -rf .xla_cache
