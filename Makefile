# equss_tpu top-level targets.

.PHONY: check test native stamp

# The snapshot invariant (VERDICT r4 #2): the default suite — which
# includes the PARITY.md freshness guard — must be green before any
# round snapshot / release commit.
check: test stamp

test:
	python -m pytest tests/ -q

# Verify the PARITY.md stamp matches the current dependency sources
# without running the whole suite.
stamp:
	python -c "import re, sys; sys.path.insert(0, '.'); \
	from equss_tpu.parity.run import parity_fingerprint; \
	txt = open('PARITY.md').read(); \
	m = re.search(r'deps=([0-9a-f]+)', txt); \
	cur = parity_fingerprint(); \
	ok = bool(m) and m.group(1) == cur; \
	print(('PARITY stamp OK: ' if ok else 'PARITY stamp STALE: ') \
	      + (m.group(1) if m else '<missing>') + ' vs ' + cur); \
	sys.exit(0 if ok else 1)"

native:
	$(MAKE) -C native
