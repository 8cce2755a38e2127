"""Extension-type registry + cloud credential-provider surface.

Reference: py-polars/src/polars/datatypes/classes.py:1402 (BaseExtension),
datatypes/extension.py:15 (register/unregister/get), io/cloud/
credential_provider/_providers.py (CredentialProvider*), io/partition.py:138
(FileProviderArgs).

Spark mapping
-------------
polars extension types annotate a storage dtype with a name + metadata and
round-trip through Arrow extension metadata.  On Spark the storage column IS
the physical column (parquet keeps the Arrow extension metadata in the field
annotations); this registry carries the driver-side name -> class mapping so
code that registers/queries extension types keeps working.

Credential providers: Spark reads cloud credentials from Hadoop
configuration (``spark.hadoop.fs.s3a.*``, ``fs.azure.*``, ``fs.gs.*``) or
instance/environment providers — not per-scan callables.  The classes here
hold the user's intent and translate to the equivalent Hadoop conf keys via
``to_spark_conf()``; scans accept-and-ignore them otherwise (the session's
Hadoop chain authenticates).
"""

from __future__ import annotations

_REGISTRY: dict[str, object] = {}


class BaseExtension:
    """Extension data type: name + storage dtype + opaque metadata."""

    def __init__(self, name: str, storage, metadata: str | None = None) -> None:
        self._name = name
        self._storage = storage
        self._metadata = metadata

    @classmethod
    def ext_from_params(cls, name: str, storage, metadata: str | None):
        slf = cls.__new__(cls)
        slf._name = name
        slf._storage = storage
        slf._metadata = metadata
        return slf

    def ext_name(self) -> str:
        return self._name

    def ext_storage(self):
        return self._storage

    def ext_metadata(self) -> str | None:
        return self._metadata

    def _string_repr(self) -> str:
        s = self.ext_name().lower()
        return s if len(s) <= 12 else s[:12]

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self._name!r}, {self._storage!r})"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, BaseExtension)
            and self._name == other._name
            and self._metadata == other._metadata
        )

    def __hash__(self) -> int:
        return hash((self._name, self._metadata))


class Extension(BaseExtension):
    """Generic (unregistered) extension data type."""


def register_extension_type(ext_name: str, ext_class=None, *, as_storage: bool = False) -> None:
    if ext_name in _REGISTRY:
        msg = f"extension type {ext_name!r} is already registered"
        raise ValueError(msg)
    if as_storage:
        if ext_class is not None:
            msg = "cannot specify ext_class when as_storage is True"
            raise TypeError(msg)
        _REGISTRY[ext_name] = "storage"
    else:
        if not (isinstance(ext_class, type) and issubclass(ext_class, BaseExtension)):
            msg = "ext_class must be a BaseExtension subclass"
            raise TypeError(msg)
        _REGISTRY[ext_name] = ext_class


def unregister_extension_type(ext_name: str) -> None:
    _REGISTRY.pop(ext_name, None)


def get_extension_type(ext_name: str):
    return _REGISTRY.get(ext_name)


# -- cloud credential providers ------------------------------------------------


class CredentialProvider:
    """Base class.  ``__call__`` returns (credential mapping, expiry)."""

    def __call__(self):  # pragma: no cover - overridden
        msg = "CredentialProvider base class cannot be called"
        raise NotImplementedError(msg)

    def to_spark_conf(self) -> dict:
        """Hadoop configuration entries equivalent to this provider."""
        return {}


class CredentialProviderFunction(CredentialProvider):
    """Wrap a user callable returning ({key: value}, expiry_unix_s)."""

    def __init__(self, function) -> None:
        self._function = function

    def __call__(self):
        return self._function()


#: return type of a credential provider function: (credentials, expiry)
CredentialProviderFunctionReturn = tuple


class CredentialProviderAWS(CredentialProvider):
    def __init__(self, *, profile_name=None, region_name=None, assume_role=None, **_kw) -> None:
        self.profile_name = profile_name
        self.region_name = region_name
        self.assume_role = assume_role

    def __call__(self):
        try:
            import boto3
        except ImportError as exc:
            raise NotImplementedError("CredentialProviderAWS needs the 'boto3' package") from exc
        session = boto3.Session(profile_name=self.profile_name, region_name=self.region_name)
        creds = session.get_credentials().get_frozen_credentials()
        out = {"aws_access_key_id": creds.access_key, "aws_secret_access_key": creds.secret_key}
        if creds.token:
            out["aws_session_token"] = creds.token
        return out, None

    def to_spark_conf(self) -> dict:
        conf = {
            "spark.hadoop.fs.s3a.aws.credentials.provider": (
                "com.amazonaws.auth.profile.ProfileCredentialsProvider"
                if self.profile_name
                else "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
            )
        }
        if self.region_name:
            conf["spark.hadoop.fs.s3a.endpoint.region"] = self.region_name
        return conf


class CredentialProviderAzure(CredentialProvider):
    def __init__(self, *, scopes=None, tenant_id=None, credentials=None, **_kw) -> None:
        self.scopes = scopes
        self.tenant_id = tenant_id
        self.credentials = credentials

    def __call__(self):
        try:
            from azure.identity import DefaultAzureCredential
        except ImportError as exc:
            raise NotImplementedError(
                "CredentialProviderAzure needs the 'azure-identity' package"
            ) from exc
        cred = self.credentials or DefaultAzureCredential()
        scopes = self.scopes or ["https://storage.azure.com/.default"]
        token = cred.get_token(*scopes)
        return {"bearer_token": token.token}, token.expires_on

    def to_spark_conf(self) -> dict:
        return {"spark.hadoop.fs.azure.account.auth.type": "OAuth"}


class CredentialProviderGCP(CredentialProvider):
    def __init__(self, *, scopes=None, credentials=None, **_kw) -> None:
        self.scopes = scopes
        self.credentials = credentials

    def __call__(self):
        try:
            import google.auth
            import google.auth.transport.requests
        except ImportError as exc:
            raise NotImplementedError(
                "CredentialProviderGCP needs the 'google-auth' package"
            ) from exc
        creds, _ = google.auth.default(scopes=self.scopes)
        creds.refresh(google.auth.transport.requests.Request())
        expiry = creds.expiry.timestamp() if creds.expiry else None
        return {"bearer_token": creds.token}, expiry

    def to_spark_conf(self) -> dict:
        return {
            "spark.hadoop.google.cloud.auth.service.account.enable": "true",
        }


class FileProviderArgs:
    """Info on the file being sinked to (reference io/partition.py:138)."""

    def __init__(self, index_in_partition: int, partition_keys) -> None:
        self.index_in_partition = index_in_partition
        self.partition_keys = partition_keys
