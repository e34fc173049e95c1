# Convenience targets. CPU-only runs skip the TPU relay dial
# (PALLAS_AXON_POOL_IPS=) — see .claude/skills/verify/SKILL.md.

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
MESH_ENV := $(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test test-fast bench dryrun lint parity

# one-command reference parity (VERDICT r3 #4): make parity MODEL=model01 DATA_DIR=/path
parity:
	python -m vae_mdl_tpu.cli.run parity $(MODEL) --data-dir $(DATA_DIR)

test:
	$(CPU_ENV) python -m pytest tests/ -q

test-fast:
	$(CPU_ENV) python -m pytest tests/ -q -x -m "not slow"

bench:  # real TPU; run solo (one process may hold the chip)
	python bench.py

dryrun:  # rehearse the EXACT driver call — no env injected; the hook self-provisions
	python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

dryrun-cpu:  # same, but skip the parent process's TPU probe (fast local check)
	$(CPU_ENV) python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

lint:
	python -m py_compile $$(git ls-files '*.py')
