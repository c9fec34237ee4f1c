.PHONY: test native bench clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C csrc

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} +
