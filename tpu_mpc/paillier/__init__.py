from .paillier import (  # noqa: F401
    BatchEncryptionKey,
    BatchDecryptionKey,
    encrypt,
    decrypt,
    ciphertext_add,
    ciphertext_add_plain,
    ciphertext_mul_plain,
)
