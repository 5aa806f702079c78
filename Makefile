# Developer entry points, mirroring the reference Makefile
# (/root/reference/Makefile): lint via ruff (format + check, settings in
# pyproject.toml), tests via pytest, live services via docker compose.
RUFF ?= ruff
PYTEST ?= python -m pytest
COMPOSE = docker compose -f tests/compose/docker-compose.yml
PY_TARGETS = floorist_spark tests __spark_entry__.py bench.py selfcheck.py

.PHONY: all format check lint test verify bench compose-up compose-down

all: lint test

format:
	$(RUFF) format $(PY_TARGETS)

check:
	$(RUFF) check $(PY_TARGETS)

lint: format check

test:
	$(PYTEST) -q

# driver-contract simulation: every queries() entry vs its DuckDB oracle
verify:
	python selfcheck.py

bench:
	python bench.py

compose-up:
	@if [ -z "$$($(COMPOSE) ps -q 2>/dev/null)" ]; then $(COMPOSE) up -d --wait; fi

compose-down:
	$(COMPOSE) down
