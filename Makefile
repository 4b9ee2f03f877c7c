# Convenience entry points. The test suite itself is plain pytest.

.PHONY: test tpu-verify native goldens

test:
	python -m pytest tests/ -q

# Round-end hardware gate (VERDICT r3 weak #3): runs the real-TPU tier
# + the 8-device multichip dryrun (incl. the SPMD cleanliness
# assertion) and writes TPU_VERIFY.json for committing with the round
# snapshot. Budget ~3 min warm link, ~25 min cold.
tpu-verify:
	python -m whisper_git_tpu.tools.tpu_verify

native:
	$(MAKE) -C native

goldens:
	python -m whisper_git_tpu.tools.goldens
