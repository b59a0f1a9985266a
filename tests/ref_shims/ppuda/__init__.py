# Minimal test-only reconstruction of the ppuda API surface used by /root/reference.
