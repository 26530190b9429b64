import numpy as np

from delay_enc_tpu.encryption import PoseidonCipher, MESSAGE_CAPACITY
from delay_enc_tpu.fields import FR
from delay_enc_tpu.poseidon import Poseidon, get_spec


def _spec():
    return get_spec(FR, 5, 4, 8, 57)


def test_encrypt_decrypt_roundtrip_zero_message():
    # mirrors poseidon_enc.rs:167-177 (zero message, zero key, nonce 1)
    cipher = PoseidonCipher(_spec(), (0, 0))
    message = [0] * MESSAGE_CAPACITY
    ct = cipher.encrypt(message, 1)
    assert len(ct) == MESSAGE_CAPACITY + 1
    assert cipher.decrypt(1) == message


def test_encrypt_deterministic_and_key_dependent():
    spec = _spec()
    rng = np.random.default_rng(0)
    k = (FR.random(rng), FR.random(rng))
    c1 = PoseidonCipher(spec, k).encrypt([0, 0], 1)
    c2 = PoseidonCipher(spec, k).encrypt([0, 0], 1)
    assert c1 == c2
    c3 = PoseidonCipher(spec, (k[0], (k[1] + 1) % FR.p)).encrypt([0, 0], 1)
    assert c1 != c3


def test_cipher_words_are_state_plus_message():
    # ciphertext words equal permuted-initial-state words + message
    spec = _spec()
    k = (123, 456)
    msg = [7, 8]
    ct = PoseidonCipher(spec, k).encrypt(msg, 1)
    ref = Poseidon.new_enc(spec, *k)
    ref.update([])
    s = ref.squeeze(0)
    assert ct[0] == (s[1] + msg[0]) % FR.p
    assert ct[1] == (s[2] + msg[1]) % FR.p


def test_decrypt_rejects_tampered_tag():
    cipher = PoseidonCipher(_spec(), (1, 2))
    cipher.encrypt([0, 0], 1)
    cipher.cipher[MESSAGE_CAPACITY] = (cipher.cipher[MESSAGE_CAPACITY] + 1) % FR.p
    assert cipher.decrypt(1) is None
