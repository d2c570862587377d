"""Release/ops tooling.

Native equivalents of the reference's auxiliary crates and scripts
(SURVEY §2.1 L8): vk_diff (vk-diff/src/main.rs), release_helper
(release-helper/src/main.rs), onchain VK encoding
(keyless-common/src/snark_js_groth16.rs, types.rs), setup procurement
(scripts/python/setups/), and structured span logging
(keyless-common/src/logging.rs).
"""
