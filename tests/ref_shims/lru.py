# test shim: minimal LRUCacheDict with the dict-ish surface the reference uses
class LRUCacheDict(dict):
    def __init__(self, max_size=1000):
        super().__init__()
        self.max_size = max_size

    def __setitem__(self, k, v):
        if len(self) >= self.max_size and k not in self:
            self.pop(next(iter(self)))
        super().__setitem__(k, v)
