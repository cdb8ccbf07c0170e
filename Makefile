.PHONY: test test-fast bench native verify dryrun clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

verify:
	env PYTHONPATH=".:$$PYTHONPATH" python .claude/skills/verify/verify_drive.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN OK')"

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
