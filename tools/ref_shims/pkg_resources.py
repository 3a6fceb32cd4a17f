"""pkg_resources stand-in (setuptools no longer ships it on py3.12).
The reference only touches it inside check_requirements
(general.py:102-125); an empty requirement list makes that check a
no-op, which is exactly what we want — the A/B harness must never
pip-install anything."""


def parse_requirements(fileobj):
    return []


def require(req):
    return []
