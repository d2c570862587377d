"""Batched prover test on the toy setup: B proofs in one sweep, all verify."""

import os

import numpy as np
import pytest

TOY = "/root/reference/prover-service/resources/toy_circuit/"

pytestmark = [
    pytest.mark.slow,  # toy Groth16 proves: minutes-scale on the CPU box
    pytest.mark.skipif(not os.path.isdir(TOY), reason="reference toy artifacts unavailable"),
]


def test_batch_prove_and_verify():
    import json

    from keyless_zk_tpu.fields.limbs import ints_to_limbs, limbs_to_ints
    from keyless_zk_tpu.groth16 import Groth16Prover, load_wtns, load_zkey, verify_groth16
    from keyless_zk_tpu.parallel.batch_prover import BatchProver

    pk = load_zkey(TOY + "toy_1.zkey")
    wtns = load_wtns(TOY + "toy.wtns")
    vk = json.load(open(TOY + "toy_vk.json"))

    prover = Groth16Prover(pk)
    batch = BatchProver(prover, max_batch=4)
    try:
        # the toy relation is a*b = 6 with public a: build 3 distinct witnesses
        base = limbs_to_ints(wtns.values)
        cases = [(2, 3), (1, 6), (6, 1)]
        witnesses, publics = [], []
        for a, b in cases:
            vals = list(base)
            vals[1], vals[2] = a, b
            witnesses.append(ints_to_limbs(vals))
            publics.append([a])

        proofs = batch.prove_batch(witnesses)
        assert len(proofs) == 3
        for proof, pub in zip(proofs, publics):
            assert verify_groth16(vk, pub, proof.to_json_dict())
        # cross-pairing must fail: proof 0 is not valid for public input 1
        assert not verify_groth16(vk, publics[1], proofs[0].to_json_dict())
    finally:
        batch.shutdown()


def test_batch_queue_coalesces():
    import json
    import threading

    from keyless_zk_tpu.groth16 import Groth16Prover, load_wtns, load_zkey, verify_groth16
    from keyless_zk_tpu.parallel.batch_prover import BatchProver

    pk = load_zkey(TOY + "toy_1.zkey")
    wtns = load_wtns(TOY + "toy.wtns")
    vk = json.load(open(TOY + "toy_vk.json"))
    prover = Groth16Prover(pk)
    # max_batch=3 shares the compiled B=3 kernel shape with the test above
    batch = BatchProver(prover, max_batch=3)
    try:
        results = [None] * 3

        def worker(i):
            results[i] = batch.prove(wtns.values, timeout=600)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        from keyless_zk_tpu.fields.limbs import limbs_to_ints

        pub = limbs_to_ints(wtns.values[1:2])
        for proof in results:
            assert verify_groth16(vk, pub, proof.to_json_dict())
    finally:
        batch.shutdown()


@pytest.mark.slow
def test_toy_load_1000():
    """1000-iteration toy load test (the reference's #[ignore]d
    dummy_circuit_load_test, prover-service/src/tests/prover_handler.rs:
    279-290): repeated proves through the batch queue must stay correct and
    leak-free. KEYLESS_LOAD_ITERS overrides the count."""
    import json
    import os

    from keyless_zk_tpu.fields.limbs import ints_to_limbs, limbs_to_ints
    from keyless_zk_tpu.groth16 import Groth16Prover, load_wtns, load_zkey, verify_groth16
    from keyless_zk_tpu.parallel.batch_prover import BatchProver

    iters = int(os.environ.get("KEYLESS_LOAD_ITERS", "1000"))
    pk = load_zkey(TOY + "toy_1.zkey")
    base = limbs_to_ints(load_wtns(TOY + "toy.wtns").values)
    vk = json.load(open(TOY + "toy_vk.json"))
    prover = Groth16Prover(pk)
    batch = BatchProver(prover, max_batch=8)
    try:
        cases = [(2, 3), (3, 2), (1, 6), (6, 1)]
        done = 0
        while done < iters:
            take = min(8, iters - done)
            ws = []
            pubs = []
            for i in range(take):
                a, b = cases[(done + i) % len(cases)]
                vals = list(base)
                vals[1], vals[2] = a, b
                ws.append(ints_to_limbs(vals))
                pubs.append([a])
            proofs = batch.prove_batch(ws)
            done += take
            # spot-verify one proof per batch (verify is host-side pairing,
            # the expensive part under load is the prover)
            assert verify_groth16(vk, pubs[0], proofs[0].to_json_dict())
    finally:
        batch.shutdown()
