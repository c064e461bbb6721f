# test shim: py3-only six with a delegating six.moves module
import importlib
import sys
import types
import urllib.parse as _up

PY2 = False
PY3 = True
string_types = (str,)
integer_types = (int,)
text_type = str
binary_type = bytes


class _Moves(types.ModuleType):
    _aliases = {
        "urllib": None,  # handled below
        "range": None,
        "_thread": "_thread",
        "builtins": "builtins",
        "queue": "queue",
        "configparser": "configparser",
    }

    def __getattr__(self, name):
        if name == "urllib":
            return _urllib
        if name == "range":
            return range
        target = self._aliases.get(name, name)
        try:
            return importlib.import_module(target)
        except Exception as e:  # pragma: no cover
            raise AttributeError(name) from e


_urllib = types.ModuleType("six.moves.urllib")
_urllib.parse = _up
_urllib.request = importlib.import_module("urllib.request")
_urllib.error = importlib.import_module("urllib.error")

moves = _Moves("six.moves")
sys.modules["six.moves"] = moves
sys.modules["six.moves.urllib"] = _urllib
sys.modules["six.moves.urllib.parse"] = _up


def iteritems(d, **kw):
    return iter(d.items(**kw))


def add_metaclass(metaclass):
    def wrapper(cls):
        orig_vars = cls.__dict__.copy()
        orig_vars.pop("__dict__", None)
        orig_vars.pop("__weakref__", None)
        return metaclass(cls.__name__, cls.__bases__, orig_vars)

    return wrapper


def with_metaclass(meta, *bases):
    return meta("_TempMeta", bases or (object,), {})


def u(s):
    return s


def b(s):
    return s.encode("latin-1") if isinstance(s, str) else s
