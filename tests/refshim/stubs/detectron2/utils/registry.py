class Registry:
    """Name -> class mapping with the detectron2 decorator API
    (``@REGISTRY.register()`` ... ``REGISTRY.get(name)``)."""

    def __init__(self, name: str):
        self._name = name
        self._map = {}
        self.__doc__ = ""

    def register(self, obj=None):
        if obj is None:
            def deco(cls):
                self._map[cls.__name__] = cls
                return cls

            return deco
        self._map[obj.__name__] = obj
        return obj

    def get(self, name: str):
        if name not in self._map:
            raise KeyError(
                f"No object named '{name}' in '{self._name}' registry")
        return self._map[name]
