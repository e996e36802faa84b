"""TagEngine: the end-to-end lifecycle facade (SURVEY.md section 3).

Maps the reference's three entry points onto driver-side orchestration
of DataFrame plans:

* config authoring (POST /create_<type>_config, main.py:2121-2179) ->
  ``create_config`` with template validation and dedup-by-hash
  deactivation of prior configs (P11, TagEngineStoreHandler.py:370-391);
* job trigger (POST /trigger_job -> /_split_work -> /_run_task,
  main.py:2930-3656) -> ``trigger_job``: expand URIs against the assets
  inventory, dispatch by config type, evaluate expressions, MERGE into
  the tag store, append history, close the job ledger row. The
  shard/task fan-out collapses into Spark's own scheduling (SURVEY R3);
* cron refresh (POST /scheduled_auto_updates, main.py:3075-3110) ->
  ``run_ready_configs``: the ready-config predicate (P10,
  TagEngineStoreHandler.py:1374-1392) + version bump and
  next_run += frequency (:290-309).

Config metadata is driver-side (it is Firestore-document sized); all
data-shaped state (tags, history, reports) lives in DataFrames.
"""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model.schemas import TAG_HISTORY_SCHEMA
from .session import local_df
from .operators import dynamic as DYN
from .operators import uri as URI
from .operators.glossary import glossary_tag_rows
from .operators.importer import melt_to_tag_rows, read_tag_csv
from .operators.backup import read_backup, restore_tag_rows
from .operators.substitution import parse_query_expression, split_resource_uri
from .store.tagstore import TagStore

_REFRESH_UNITS = {"minutes": 60, "hours": 3600, "days": 86400}

# config types whose jobs always replay their full input — the
# incremental (changed-assets-only) flag has no meaning for them
_NON_INCREMENTAL_TYPES = (
    "TAG_EXPORT", "ENTRY_CREATE", "TAG_IMPORT", "TAG_RESTORE", "SHARD_EXPORT",
)

# config types that produce side effects (reports/entries/shards)
# instead of tag-row merges; no template required at create time
_SIDE_EFFECT_TYPES = ("TAG_EXPORT", "ENTRY_CREATE", "SHARD_EXPORT")

# the 9 reference config types (ConfigType.py:4-12) — everything
# trigger_job can dispatch; validated at create time like the
# reference's check_config_type (main.py) — plus SHARD_EXPORT, this
# repo's training-data extension: the corpus pipeline's last mile
# (pipeline/export.write_training_shards) run with the same scheduling,
# ledger, and job-metadata accounting as every reference type
_CONFIG_TYPES = (
    "DYNAMIC_TAG_TABLE", "DYNAMIC_TAG_COLUMN", "STATIC_TAG_ASSET",
    "GLOSSARY_TAG_ASSET", "SENSITIVE_TAG_COLUMN", "TAG_IMPORT",
    "TAG_RESTORE", "TAG_EXPORT", "ENTRY_CREATE", "SHARD_EXPORT",
)


class TagEngine:
    # after this many history appends the lazy union spills to parquet
    # (_spill_history): each merge otherwise accretes one union branch
    # plus one pinned tagstore checkpoint generation for the session's
    # lifetime
    HISTORY_SPILL_EVERY = 32

    def __init__(
        self,
        spark: SparkSession,
        tags_path: str | None = None,
        qualify=None,
        history_spill_every: int | None = None,
    ):
        self.spark = spark
        self.templates: dict[str, list[dict]] = {}
        self.configs: dict[str, dict] = {}
        self.jobs: list[dict] = []
        self.store = TagStore(spark, path=tags_path)
        self._history = spark.createDataFrame([], TAG_HISTORY_SCHEMA)
        self._job_metadata: list[dict] = []
        self._history_base: DataFrame | None = None
        self._history_spill_dir: str | None = None
        self._history_appends = 0
        # True when history() handed out a lazy plan that references the
        # CURRENT in-memory union branches — those plans pin the
        # superseded merge checkpoints, so the next spill must not free
        # them deterministically (see _spill_history)
        self._history_handed_out = False
        self.history_spill_every = (
            history_spill_every if history_spill_every is not None else self.HISTORY_SPILL_EVERY
        )
        self._seq = 0
        self.qualify = qualify or (lambda p, d, t: t)
        # keyed settings documents, mirroring the reference's
        # settings collection (TagEngineStoreHandler.py:50-200:
        # per-user defaults, tag_history, job_metadata,
        # coverage_report). tag_history defaults ENABLED here — the
        # engine's history table doubles as its audit log, and every
        # history-consuming query assumes it is on; the reference
        # default (off until configured) is one set_ call away.
        self.settings: dict[str, dict] = {"tag_history": {"enabled": True}}

    # -- templates ---------------------------------------------------------

    def create_template(self, template_id: str, fields: list[dict]) -> None:
        """fields: [{field_id, field_type[, enum_values][, order]}]."""
        for f in fields:
            if f["field_type"] not in ("bool", "string", "double", "enum", "richtext", "datetime", "timestamp"):
                raise ValueError(f"unknown field_type {f['field_type']!r}")
        self.templates[template_id] = fields

    def template_fields_df(self, template_id: str) -> DataFrame:
        rows = [
            {
                "template_id": template_id,
                "field_id": f["field_id"],
                "display_name": f.get("display_name"),
                "field_type": f["field_type"],
                "is_required": f.get("is_required", False),
                "order": f.get("order", i),
                "enum_values": f.get("enum_values"),
            }
            for i, f in enumerate(self.templates[template_id])
        ]
        from .model.schemas import TEMPLATES_SCHEMA

        return local_df(self.spark, rows, TEMPLATES_SCHEMA)

    # -- configs -----------------------------------------------------------

    def _uuid(self, kind: str) -> str:
        self._seq += 1
        return f"{kind}-{self._seq:06d}"

    def create_config(self, config_type: str, template_id: str, **kw) -> str:
        """Validate against the template and persist; a new config with
        the same (type, template, included_uris) hash deactivates the
        prior one (P11 dedup-by-hash)."""
        # TAG_EXPORT carries no template in the reference either (its
        # export config stores only target coordinates, main.py:3621);
        # ENTRY_CREATE may tag the created entries, so a template is
        # allowed but not required.
        if config_type not in _CONFIG_TYPES:
            raise ValueError(
                f"unknown config_type {config_type!r}; choose one of {_CONFIG_TYPES}"
            )
        if config_type == "TAG_EXPORT" and not kw.get("target_path"):
            raise ValueError("TAG_EXPORT config requires target_path")
        if config_type == "ENTRY_CREATE" and not kw.get("directory"):
            raise ValueError("ENTRY_CREATE config requires directory")
        if config_type == "SHARD_EXPORT":
            # validated at create time, not first run: a cron config
            # that cannot dispatch is a bug at authoring time
            if not kw.get("target_path"):
                raise ValueError("SHARD_EXPORT config requires target_path")
            if not (kw.get("num_shards") or 0) >= 1:
                raise ValueError("SHARD_EXPORT config requires num_shards >= 1")
            if bool(kw.get("source_table")) == bool(kw.get("source_path")):
                raise ValueError(
                    "SHARD_EXPORT config requires exactly one of source_table "
                    "(a registered view) or source_path (a parquet directory)"
                )
        if template_id is None:
            if config_type not in _SIDE_EFFECT_TYPES:
                raise ValueError(f"{config_type} config requires a template_id")
            tfields = {}
        elif template_id not in self.templates:
            raise ValueError(f"unknown template {template_id!r}")
        else:
            tfields = {f["field_id"]: f for f in self.templates[template_id]}
        for f in kw.get("fields", []):
            if f["field_id"] not in tfields:
                raise ValueError(f"field {f['field_id']!r} not in template {template_id!r}")
            tf = tfields[f["field_id"]]
            f.setdefault("field_type", tf["field_type"])
            if tf["field_type"] == "enum" and f.get("field_value") is not None:
                if f["field_value"] not in (tf.get("enum_values") or []):
                    raise ValueError(
                        f"enum value {f['field_value']!r} not in {tf.get('enum_values')}"
                    )

        # tagging types keep the original 3-part hash so configs
        # persisted by earlier builds still dedup against new ones;
        # only the side-effect types (which older builds could not
        # persist) extend the key with their target coordinates
        hash_src = f"{config_type}|{template_id}|{kw.get('included_uris', '')}"
        if config_type in _SIDE_EFFECT_TYPES:
            hash_src += f"|{kw.get('target_path', '')}|{kw.get('directory', '')}"
        if config_type == "SHARD_EXPORT":
            hash_src += f"|{kw.get('source_table', '')}|{kw.get('source_path', '')}"
        uris_hash = hashlib.md5(hash_src.encode()).hexdigest()
        for cfg in self.configs.values():
            if cfg["uris_hash"] == uris_hash and cfg["config_status"] == "ACTIVE":
                cfg["config_status"] = "INACTIVE"

        uuid = self._uuid("cfg")
        self.configs[uuid] = {
            "config_uuid": uuid,
            "config_type": config_type,
            "config_status": "ACTIVE",
            "template_id": template_id,
            "uris_hash": uris_hash,
            "scheduling_status": "READY",
            "version": 1,
            "next_run": kw.get("next_run"),
            **kw,
        }
        return uuid

    def lookup_config_by_uris(self, template_id: str, included_uris: str) -> dict | None:
        """Trigger-by-URI lookup (J8, TagEngineStoreHandler.py:1395-1428)."""
        for cfg in self.configs.values():
            if (
                cfg["template_id"] == template_id
                and cfg.get("included_uris") == included_uris
                and cfg["config_status"] == "ACTIVE"
            ):
                return cfg
        return None

    # -- job execution -----------------------------------------------------

    def _record_job(
        self,
        job_uuid: str,
        config_uuid: str,
        config_type: str,
        started: datetime.datetime,
        *,
        status: str,
        task_count: int = 0,
        tasks_success: int = 0,
        tasks_failed: int = 0,
        errors: list | None = None,
    ) -> None:
        """Append one job-ledger row (the single definition of the row
        shape — save_state serializes these, jobs_df reads them) and
        stash per-task errors when present."""
        self.jobs.append(
            {
                "job_uuid": job_uuid,
                "config_uuid": config_uuid,
                "config_type": config_type,
                "job_status": status,
                "task_count": task_count,
                "tasks_ran": task_count,
                "tasks_success": tasks_success,
                "tasks_failed": tasks_failed,
                "creation_time": started,
                "completion_time": datetime.datetime.now(datetime.timezone.utc),
            }
        )
        if errors:
            self.job_errors = getattr(self, "job_errors", {})
            self.job_errors[job_uuid] = errors

    def trigger_job(self, config_uuid: str, assets: DataFrame | None = None, **kw) -> str:
        cfg = self.configs[config_uuid]
        if cfg["config_status"] != "ACTIVE":
            raise ValueError(f"config {config_uuid} is not active")
        incremental = kw.pop("incremental", False)
        if incremental:
            # loud-failure policy, uniformly: a silently-ignored flag
            # would misreport what ran. Side-effect jobs rebuild their
            # full report/entry set; imports/restores replay their full
            # file; and an asset-scoped refresh needs an asset catalog.
            if cfg["config_type"] in _NON_INCREMENTAL_TYPES:
                raise ValueError(
                    f"incremental refresh is not applicable to {cfg['config_type']} configs"
                )
            if assets is None:
                raise ValueError("incremental refresh requires an asset catalog")
            # refresh only assets whose data changed since their last tag
            # (operators/incremental) — scheduled-job cost tracks change
            # rate, not catalog size
            from .operators.incremental import stale_assets

            assets = stale_assets(assets, self.store.all(), cfg["template_id"])
        job_uuid = self._uuid("job")
        started = datetime.datetime.now(datetime.timezone.utc)
        # caller-supplied workflow metadata records at job CREATION like
        # the reference (main.py:2999-3017), independent of the job's
        # outcome, gated on the job_metadata settings doc
        self._record_job_metadata(job_uuid, kw.pop("job_metadata", None), started)
        # side-effect config types: all 9 reference config types route
        # through the job machinery (ConfigType.py:4-12, main.py:
        # 3597-3628), so exports and entry syncs get the job ledger and
        # the scheduled-refresh treatment like every tagging type — they
        # just produce reports/entries instead of tag-row merges.
        if cfg["config_type"] in _SIDE_EFFECT_TYPES:
            try:
                if cfg["config_type"] == "TAG_EXPORT":
                    counts = self.export_reports(
                        cfg["target_path"], truncate=cfg.get("truncate", False)
                    )
                    n = sum(1 for c in counts.values() if c)
                elif cfg["config_type"] == "SHARD_EXPORT":
                    # the corpus pipeline's last mile with job-ledger
                    # accounting: task grain = shard (one data-loader
                    # unit), so task_count mirrors the manifest row
                    # count — num_shards by write_training_shards'
                    # contract, empty shards included
                    from .pipeline.export import write_training_shards

                    corpus = (
                        self.spark.table(cfg["source_table"])
                        if cfg.get("source_table")
                        else self.spark.read.parquet(cfg["source_path"])
                    )
                    manifest = write_training_shards(
                        corpus,
                        cfg["target_path"],
                        cfg["num_shards"],
                        id_col=cfg.get("id_col", "doc_id"),
                        token_col=cfg.get("token_col"),
                        data_format=cfg.get("data_format", "parquet"),
                        compression=cfg.get("compression"),
                    )
                    n = manifest.count()
                else:
                    self.create_entries(
                        cfg["directory"],
                        cfg.get("entry_project", "local"),
                        cfg.get("entry_dataset"),
                    )
                    n = self._last_entries_created
            except Exception as exc:
                self._record_job(
                    job_uuid, config_uuid, cfg["config_type"], started,
                    status="ERROR", tasks_failed=1,
                )
                # explicit contract with run_ready_configs: this raise
                # already has its ledger row — no scheduler fallback row
                exc._ledger_recorded = True
                raise
            self._record_job(
                job_uuid, config_uuid, cfg["config_type"], started,
                status="SUCCESS", task_count=n, tasks_success=n,
            )
            cfg["scheduling_status"] = "READY"
            return job_uuid
        dispatch = {
            "DYNAMIC_TAG_TABLE": self._run_dynamic_table,
            "DYNAMIC_TAG_COLUMN": self._run_dynamic_column,
            "STATIC_TAG_ASSET": self._run_static,
            "GLOSSARY_TAG_ASSET": self._run_glossary,
            "SENSITIVE_TAG_COLUMN": self._run_sensitive,
            "TAG_IMPORT": self._run_import,
            "TAG_RESTORE": self._run_restore,
        }
        if cfg["config_type"] not in dispatch:
            raise ValueError(f"unsupported config_type {cfg['config_type']!r}")
        errors: list[tuple[str, str]] = []
        kw["_errors"] = errors
        try:
            raw = dispatch[cfg["config_type"]](cfg, assets, **kw)
            tags = DYN.coerce_long_rows(
                raw,
                bool_mode="csv" if cfg["config_type"] in ("TAG_IMPORT", "TAG_RESTORE", "GLOSSARY_TAG_ASSET") else "query",
            ).withColumn("job_uuid", F.lit(job_uuid))
            history = self.store.merge(tags, overwrite=cfg.get("overwrite", True))
            n = self._append_history(history, job_uuid)
            failed = len(errors)
            status = "ERROR" if failed else "SUCCESS"
        except Exception as exc:
            self._record_job(
                job_uuid, config_uuid, cfg["config_type"], started,
                status="ERROR", tasks_failed=1,
            )
            exc._ledger_recorded = True
            raise
        self._record_job(
            job_uuid, config_uuid, cfg["config_type"], started,
            status=status, task_count=n + failed, tasks_success=n,
            tasks_failed=failed, errors=errors,
        )
        cfg["scheduling_status"] = "READY"
        return job_uuid

    def _matched_uris(self, cfg: dict, assets: DataFrame) -> list[str]:
        matched = URI.expand_included_excluded(
            assets, cfg["included_uris"], cfg.get("excluded_uris")
        )
        return [r["asset_uri"] for r in matched.select("asset_uri").collect()]

    # measured crossover (tools/scale_ladder.py): thread-pooled per-asset
    # execution beats the fused union up to hundreds of assets on
    # local[32]; fused wins when per-asset job scheduling dominates
    # (thousands of assets / real-cluster job latency) or when assets
    # share scans. Configs can override with fuse_threshold.
    FUSE_THRESHOLD = 256

    def _run_dynamic_table(self, cfg, assets, **kw):
        # scale form: cfg["inventory_view"] names a registered table/view
        # holding EVERY matched asset's rows with an asset_uri column
        # (one partitioned scan). The fused plan then has a single leaf
        # regardless of asset count — the shape that survives the
        # reference's 500k/1M-asset ladder — and asset matching is a
        # semi-join, never a driver-side uri collect.
        inv_view = cfg.get("inventory_view")
        if inv_view:
            if not DYN.fusable(cfg["fields"]):
                # silently falling back to the per-asset uri-collect path
                # would reintroduce exactly the driver-side shape the
                # inventory form exists to avoid — fail loudly instead
                opaque = [
                    f["field_id"] for f in cfg["fields"]
                    if DYN.classify_expression(f["query_expression"])[0] == "opaque"
                    or f["field_type"] == "richtext"
                ]
                raise ValueError(
                    f"inventory_view config requires fusable fields; not fusable: {opaque}"
                )
            matched = URI.expand_included_excluded(
                assets, cfg["included_uris"], cfg.get("excluded_uris")
            ).select("asset_uri")
            inv = self.spark.table(inv_view).join(matched, "asset_uri", "left_semi")
            return DYN.run_config_fused(self.spark, cfg["fields"], inv, cfg["template_id"])
        uris = self._matched_uris(cfg, assets)
        errors = kw.get("_errors")
        threshold = cfg.get("fuse_threshold", self.FUSE_THRESHOLD)
        if DYN.fusable(cfg["fields"]) and len(uris) >= threshold:
            pairs = []
            for uri in uris:
                p, d, t = split_resource_uri(uri)
                try:
                    pairs.append((uri, self.spark.table(self.qualify(p, d or "", t or ""))))
                except Exception as ex:
                    if errors is None:
                        raise
                    errors.append((uri, f"{type(ex).__name__}: {ex}"))
            if len(pairs) > 1:
                return DYN.run_config_fused(self.spark, cfg["fields"], pairs, cfg["template_id"])
            uris = [uri for uri, _ in pairs]
        rows = DYN.run_config_per_asset(
            self.spark, cfg["fields"], uris, cfg["template_id"], self.qualify,
            errors=errors,
        )
        return DYN.raw_rows_to_df(self.spark, rows)

    def _run_dynamic_column(self, cfg, assets, **kw):
        """Default: thread-pooled per-(asset, column) statements —
        measured faster than the fused single pass when expressions
        carry count-distincts (the multi-distinct Expand multiplies scan
        rows by #aggregates; see SCALE.md). fuse_columns=True opts into
        the one-pass plan for distinct-free profiles or job-count-bound
        catalogs."""
        from concurrent.futures import ThreadPoolExecutor

        matched = URI.expand_included_excluded(
            assets, cfg["included_uris"], cfg.get("excluded_uris")
        )
        uris = [r["asset_uri"] for r in matched.select("asset_uri").collect()]
        tasks: list[tuple[str, str]] = []
        fused_parts = []

        discovered = self._discover_columns(cfg, matched, uris)
        for uri in uris:
            columns = discovered[uri]
            if cfg.get("fuse_columns"):
                p, d, t = split_resource_uri(uri)
                fused_parts.append(
                    DYN.run_column_config_fused(
                        self.spark, cfg["fields"], uri,
                        self.spark.table(self.qualify(p, d or "", t or "")),
                        columns, cfg["template_id"],
                    )
                )
            else:
                tasks.extend((uri, col) for col in columns)

        all_rows: list[dict] = []
        if tasks:
            def one(task):
                uri, col = task
                return DYN.run_config_per_asset(
                    self.spark, cfg["fields"], [uri], cfg["template_id"],
                    self.qualify, column=col, errors=kw.get("_errors"),
                )

            with ThreadPoolExecutor(max_workers=8) as pool:
                for rows in pool.map(one, tasks):
                    all_rows.extend(rows)

        out = DYN.raw_rows_to_df(self.spark, all_rows)
        for part in fused_parts:
            out = out.unionByName(part)
        return out

    def _discover_columns(
        self, cfg: dict, matched: DataFrame, uris: list[str]
    ) -> dict[str, list[str]]:
        """uri -> ordered column list from ``included_columns_query``.

        Single-pass where the query shape allows it:

        - ``schema`` (SELECT column_name over INFORMATION_SCHEMA.COLUMNS
          — the reference's own example configs): ONE distributed plan
          over the matched inventory's ``schema`` column covers every
          asset; zero per-asset Spark jobs. The collect back is
          dimension-sized (one row per matched asset), the same shape
          the execution loop already iterates.
        - ``constant`` (no substitution variables): asset-independent —
          evaluated once, shared by every asset.
        - ``opaque``: arbitrary per-asset user SQL; thread-pooled, the
          reference's per-asset semantics (the measured fallback).

        Every regime reads ALL rows x cells of the query result —
        reference DataCatalogController.py:380-384 (a first-row-only
        read would see one column of a one-column-per-row query).
        """
        from concurrent.futures import ThreadPoolExecutor

        query = cfg["included_columns_query"]
        kind = DYN.classify_columns_query(query)
        if kind == "schema":
            pairs = (
                DYN.discover_columns_schema(matched, query)
                .groupBy("asset_uri")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "column"))),
                        lambda s: s["column"],
                    ).alias("cols")
                )
                .collect()
            )
            found = {r["asset_uri"]: list(r["cols"]) for r in pairs}
            return {u: found.get(u, []) for u in uris}
        if kind == "constant":
            cols = [
                c for row in self.spark.sql(query).collect() for c in row if c
            ]
            return {u: list(cols) for u in uris}

        def discover(uri):
            cols_q = parse_query_expression(uri, query, None, self.qualify)
            return uri, [
                c for row in self.spark.sql(cols_q).collect() for c in row if c
            ]

        with ThreadPoolExecutor(max_workers=8) as pool:
            return dict(pool.map(discover, uris))

    def _run_static(self, cfg, assets, **kw):
        """Static tags = matched assets x config fields, entirely as a
        plan: the matched-URI DataFrame crossJoins a broadcast fields
        table (always dimension-sized: one row per template field).
        Nothing is collected to the driver, so the reference's flagship
        static load shape (1M assets x 7 fields,
        examples/load/configs/static_asset_1m.json:31) is a single
        distributed 7M-row job instead of 7M driver-side dicts through
        createDataFrame."""
        matched = URI.expand_included_excluded(
            assets, cfg["included_uris"], cfg.get("excluded_uris")
        ).select("asset_uri")
        fields_df = local_df(
            self.spark,
            [
                (
                    cfg["template_id"],
                    f["field_id"],
                    f["field_type"],
                    None if f.get("field_value") is None else str(f["field_value"]),
                )
                for f in cfg["fields"]
            ],
            "template_id string, field_id string, field_type string, raw_value string",
        )
        return matched.crossJoin(F.broadcast(fields_df)).select(
            "asset_uri",
            F.lit(None).cast("string").alias("column"),
            "template_id",
            "field_id",
            "field_type",
            "raw_value",
        )

    def _run_glossary(self, cfg, assets, **kw):
        matched = URI.expand_included_excluded(
            assets, cfg["included_uris"], cfg.get("excluded_uris")
        )
        return glossary_tag_rows(matched, kw["mapping"], cfg["template_id"])

    def _run_sensitive(self, cfg, assets, **kw):
        """Sensitive-column classification over ALL matched assets in one
        pass (reference runs three generated statements per asset,
        DataCatalogController.py:873-984). Emits per-column tags:
        sensitive_field bool + sensitive_type string with the notable
        infotype. Assets classified Public_Information are skipped
        (reference :998)."""
        from .operators import sensitive as SEN

        findings = kw["findings"]  # (asset_uri, field, infotype)
        selection = kw["selection"]
        classification = kw["classification"]

        matched = URI.expand_included_excluded(
            assets, cfg["included_uris"], cfg.get("excluded_uris")
        ).select("asset_uri")
        findings = findings.join(F.broadcast(matched), "asset_uri", "left_semi")

        per_field = SEN.field_infotypes(findings, keys=["asset_uri", "field"])
        # the notable-infotype table feeds three consumers (tag rows,
        # policy-tag requests, the classification rollup) — cache it so
        # the containment join + min-by derivation runs once per job,
        # not once per consumer. Sized per tagged COLUMN, orders of
        # magnitude below the scanned data at any scale.
        notables = SEN.select_notable_infotype(
            per_field, selection, keys=["asset_uri", "field"]
        ).cache()

        # per-asset classification: smallest superset over the asset's
        # distinct notable infotypes; Public_Information assets drop
        table_sets = notables.groupBy("asset_uri").agg(
            F.array_sort(F.collect_set("notable_infotype")).alias("have")
        )
        classed = table_sets.join(
            F.broadcast(classification),
            F.size(F.array_except(F.col("have"), F.col("notable_infotypes"))) == 0,
            "inner",
        ).groupBy("asset_uri").agg(
            F.min_by(
                F.col("classification_result"),
                F.struct(F.size("notable_infotypes"), F.col("classification_result")),
            ).alias("classification_result")
        ).cache()  # consumed by both the keep-filter and policy requests
        keep = classed.filter(F.col("classification_result") != "Public_Information")

        # policy-tag application (reference :1038-1042 gate, :1064-1097
        # schema update): stash the requests; callers materialize the
        # schema rewrite with apply_policy_tags(assets).
        if cfg.get("create_policy_tags") and kw.get("taxonomy") is not None:
            self.last_policy_tag_requests = SEN.policy_tag_requests(
                notables, classed, kw["taxonomy"]
            )

        notables = notables.join(F.broadcast(keep.select("asset_uri")), "asset_uri", "left_semi")

        flag_rows = notables.select(
            "asset_uri",
            F.col("field").alias("column"),
            F.lit(cfg["template_id"]).alias("template_id"),
            F.lit("sensitive_field").alias("field_id"),
            F.lit("bool").alias("field_type"),
            F.lit("TRUE").alias("raw_value"),
        )
        type_rows = notables.select(
            "asset_uri",
            F.col("field").alias("column"),
            F.lit(cfg["template_id"]).alias("template_id"),
            F.lit("sensitive_type").alias("field_id"),
            F.lit("string").alias("field_type"),
            F.col("notable_infotype").alias("raw_value"),
        )
        return flag_rows.unionByName(type_rows)

    def apply_policy_tags(self, assets: DataFrame) -> DataFrame:
        """Materialize the schema rewrite for the last sensitive job run
        with create_policy_tags=True (reference apply_policy_tags,
        DataCatalogController.py:1064-1097)."""
        from .operators import sensitive as SEN

        if getattr(self, "last_policy_tag_requests", None) is None:
            return assets
        return SEN.apply_policy_tags(assets, self.last_policy_tag_requests)

    def _run_import(self, cfg, assets, **kw):
        csv_df = kw.get("csv_df")
        if csv_df is None:
            csv_df = read_tag_csv(self.spark, cfg["csv_path"])
        return melt_to_tag_rows(
            csv_df, self.template_fields_df(cfg["template_id"]), cfg["template_id"]
        )

    def _run_restore(self, cfg, assets, **kw):
        backup = kw.get("backup_df")
        if backup is None:
            backup = read_backup(self.spark, cfg["backup_path"])
        return restore_tag_rows(backup, cfg["template_id"], cfg["project_id"])

    # -- synchronous tag operations (no job machinery, like the
    # reference's /copy_tags and /update_tag_subset routes) -----------------

    def copy_tags(self, source_uri: str, target_uri: str, overwrite: bool = True) -> int:
        """J7 (reference DataCatalogController.py:1946-2056): re-key every
        tag of the source asset onto the target and MERGE."""
        src = self.store.all().filter(F.col("asset_uri") == source_uri)
        moved = src.withColumn("asset_uri", F.lit(target_uri))
        job_uuid = self._uuid("copy")
        events = self.store.merge(moved, overwrite=overwrite)
        return self._append_history(events, job_uuid)

    def copy_and_update_tags(
        self,
        source_uri: str,
        target_uri: str,
        template_id: str,
        raw_rows: list[dict],
        column: str | None = None,
        overwrite: bool = True,
    ) -> int:
        """Fused copy_tags + update_tag_subset (the reference's
        /copy_tags then /update_tag route pair issued back-to-back on
        the same target, DataCatalogController.py:1946-2056 +
        :2091-2178): ONE MERGE applies both, so the store pays one
        checkpoint + one history append instead of two.

        The incoming batch pre-resolves key collisions (a subset-update
        field also present in the copied tag): update rows win, exactly
        what the sequential pair converges to. History differs only in
        shape — the updated field logs one CREATE-with-final-value
        instead of CREATE then UPDATE; final state is identical.
        """
        from .store.tagstore import TAG_KEY

        src = self.store.all().filter(F.col("asset_uri") == source_uri)
        moved = src.withColumn("asset_uri", F.lit(target_uri))
        rows = [
            {
                "asset_uri": target_uri,
                "column": column,
                "template_id": template_id,
                "field_id": r["field_id"],
                "field_type": r["field_type"],
                "raw_value": r.get("raw_value"),
            }
            for r in raw_rows
        ]
        upd = DYN.coerce_long_rows(DYN.raw_rows_to_df(self.spark, rows), bool_mode="csv")
        cond = [moved[k].eqNullSafe(upd[k]) for k in TAG_KEY]
        merged_in = moved.join(upd, cond, "left_anti").unionByName(
            upd, allowMissingColumns=True
        )
        job_uuid = self._uuid("copyupd")
        events = self.store.merge(merged_in, overwrite=overwrite)
        return self._append_history(events, job_uuid)

    def update_tag_subset(self, template_id: str, asset_uri: str, column: str | None, raw_rows: list[dict]) -> int:
        """Overwrite-merge of a field subset (reference main.py:2868-2919
        -> DataCatalogController.py:2091-2178): only the named fields
        change, other fields of the tag survive."""
        rows = [
            {
                "asset_uri": asset_uri,
                "column": column,
                "template_id": template_id,
                "field_id": r["field_id"],
                "field_type": r["field_type"],
                "raw_value": r.get("raw_value"),
            }
            for r in raw_rows
        ]
        tags = DYN.coerce_long_rows(DYN.raw_rows_to_df(self.spark, rows), bool_mode="csv")
        job_uuid = self._uuid("upd")
        events = self.store.merge(tags)
        return self._append_history(events, job_uuid)

    def create_entries(self, directory: str, project: str = "local", dataset: str | None = None) -> DataFrame:
        """S15 (reference apply_entry_config,
        DataCatalogController.py:498-674): discover files as catalog
        entries — one inventory row per file with footer schema — and
        keep them on the engine for subsequent config runs. Re-running
        replaces rows for the same asset_uri (idempotent)."""
        from .operators.discovery import discover_parquet_assets

        found = discover_parquet_assets(self.spark, directory, project, dataset)
        # this run's discovery count, for the job ledger — the return
        # value is the CUMULATIVE inventory, which would overstate a
        # job's work on every re-run
        self._last_entries_created = found.count()
        if not hasattr(self, "assets") or self.assets is None:
            self.assets = found
        else:
            keys = found.select("asset_uri")
            survivors = self.assets.join(keys, "asset_uri", "left_anti")
            self.assets = survivors.unionByName(found)
        return self.assets

    def export_reports(self, base_path: str, truncate: bool = False) -> dict[str, int]:
        """TAG_EXPORT (reference export path, BigQueryUtils.py:234-313):
        write the three report grains under base_path; returns row
        counts. When the job_metadata settings doc is enabled and rows
        exist, the job-metadata table (reference BigQueryUtils.py:
        504-521) exports alongside, day-partitioned on event_time's
        date like the reference table."""
        from .operators import export as EXP

        out = {}
        for name, df in [
            ("catalog_report_dataset_tags", EXP.export_dataset_tags(self.store.all())),
            ("catalog_report_table_tags", EXP.export_table_tags(self.store.all())),
            ("catalog_report_column_tags", EXP.export_column_tags(self.store.all())),
        ]:
            out[name] = df.count()
            if out[name]:
                EXP.write_report(df, f"{base_path}/{name}", truncate=truncate)
        if self.job_metadata_enabled() and self._job_metadata:
            md = self.job_metadata_df()
            out["job_metadata"] = md.count()
            # always a full overwrite: job_metadata_df() is the CUMULATIVE
            # dimension-sized list, and its rows carry no per-export stamp
            # (unlike the report tables' export_time) — an append would
            # duplicate every prior row on each re-export
            (
                md.withColumn("event_date", F.to_date("event_time"))
                .write.mode("overwrite")
                .partitionBy("event_date")
                .parquet(f"{base_path}/job_metadata")
            )
        return out

    # -- job metadata --------------------------------------------------------

    def job_metadata_enabled(self) -> bool:
        """Gate on job-metadata recording — OFF until configured, the
        reference default (ENABLE_JOB_METADATA in tagengine.ini,
        main.py:178-190; settings doc TagEngineStoreHandler.py:153-165)."""
        return bool(self.settings.get("job_metadata", {}).get("enabled"))

    def _record_job_metadata(self, job_uuid: str, metadata, event_time) -> None:
        """One (event_time, job_uuid, metadata JSON, tag_creator_sa,
        tag_invoker_sa) row per job that supplied metadata — reference
        write_job_metadata (BigQueryUtils.py:196-209, row schema
        :504-521). Non-dict metadata and disabled settings are ignored
        with the reference's warning semantics (main.py:3003-3009); the
        service accounts come from the settings doc (the engine has no
        auth layer — SURVEY scopes out F13/JWT)."""
        import json
        import warnings

        if metadata is None:
            return
        if not isinstance(metadata, dict):
            warnings.warn(f"job metadata ignored: {type(metadata).__name__} is not a dict")
            return
        if not self.job_metadata_enabled():
            warnings.warn("job metadata ignored: job_metadata settings doc not enabled")
            return
        try:
            encoded = json.dumps(metadata, sort_keys=True)
        except (TypeError, ValueError) as exc:
            # same warn-and-ignore contract as the non-dict case: bad
            # metadata must never kill the job it annotates (it would
            # raise BEFORE the dispatch try-blocks, so the job would die
            # with no ledger row at all)
            warnings.warn(f"job metadata ignored: not JSON-serializable ({exc})")
            return
        doc = self.settings.get("job_metadata", {})
        self._job_metadata.append(
            {
                "event_time": event_time,
                "job_uuid": job_uuid,
                "metadata": encoded,
                "tag_creator_sa": doc.get("tag_creator_sa", "local"),
                "tag_invoker_sa": doc.get("tag_invoker_sa", "local"),
            }
        )

    def job_metadata_df(self) -> DataFrame:
        """The job-metadata table in the reference's exact column order
        (BigQueryUtils.py:504-521); dimension-sized like the jobs
        ledger."""
        from .model.schemas import JOB_METADATA_SCHEMA

        return local_df(self.spark, self._job_metadata, JOB_METADATA_SCHEMA)

    # -- history / scheduling ----------------------------------------------

    def _append_history(self, events: DataFrame, job_uuid: str) -> int:
        """T2: every applied mutation appends an audit row. asset_name is
        the singularized reference form project/dataset/ds/table/t[/column/c]
        (BigQueryUtils.py:123-128)."""
        from .model.coercion import render_tag_value

        singular = F.regexp_replace(
            F.regexp_replace(F.col("asset_uri"), "/datasets/", "/dataset/"),
            "/tables/",
            "/table/",
        )
        asset_name = F.when(
            F.col("column").isNotNull(), F.concat(singular, F.lit("/column/"), F.col("column"))
        ).otherwise(singular)
        # one driver-side timestamp per append: deterministic across
        # recomputes (the reference stamps one export/event time per
        # job), so the history rows need no pinning checkpoint of their
        # own — the merge's combined checkpoint already materialized the
        # expensive joins and the count() below only re-runs a filter.
        now = datetime.datetime.now()
        rows = events.select(
            F.lit(now).cast("timestamp").alias("event_time"),
            asset_name.alias("asset_name"),
            F.col("column"),
            F.col("template_id"),
            F.col("field_id"),
            render_tag_value(
                F.col("field_type"),
                F.col("field_value_string"),
                F.col("field_value_double"),
                F.col("field_value_bool"),
                F.col("field_value_ts"),
            ).alias("field_value"),
            F.col("action"),
            F.lit(None).cast("string").alias("tag_creator_account"),
            F.lit(None).cast("string").alias("tag_invoker_account"),
            F.lit(job_uuid).alias("job_uuid"),
            F.lit(now.date()).cast("date").alias("event_date"),
        )
        if self.tag_history_enabled():
            self._history = self._history.unionByName(rows)
            self._history_appends += 1
            if self._history_appends >= self.history_spill_every:
                self._spill_history()
        # a driver-resident merge already knows its event count — the
        # select above is 1:1, so reuse it instead of scheduling a
        # count job per merge in an interactive chain
        known = getattr(events, "_tag_engine_event_count", None)
        return known if known is not None else rows.count()

    def _spill_history(self) -> None:
        """Bound the history union: write the accumulated in-memory
        branches to a day-partitioned parquet directory (the reference's
        day-partitioned history table shape, BigQueryUtils.py:344-387),
        reset the union to a single parquet read, and deterministically
        release every superseded merge checkpoint
        (TagStore.release_event_generations — safe precisely now, the
        spill just materialized the only rows those generations still
        backed). Keeps a long interactive session at O(1) checkpoint
        generations and O(1) plan depth instead of one pinned generation
        plus one union branch per merge."""
        import tempfile

        if self._history_spill_dir is None:
            self._history_spill_dir = tempfile.mkdtemp(prefix="tag_engine_history_")
        self._history.write.mode("append").partitionBy("event_date").parquet(
            self._history_spill_dir
        )
        # restore field order and exact types (partition-column
        # inference reads event_date back from the directory names)
        self._history_base = self.spark.read.parquet(self._history_spill_dir).select(
            *[F.col(f.name).cast(f.dataType) for f in TAG_HISTORY_SCHEMA.fields]
        )
        self._history = self.spark.createDataFrame([], TAG_HISTORY_SCHEMA)
        self._history_appends = 0
        if self._history_handed_out:
            # a caller still holds a lazy history() plan over the union
            # branches just spilled; freeing their merge checkpoints
            # would truncate lineage underneath it (a freed
            # localCheckpoint cannot recompute). Drop the engine's own
            # references instead — the JVM ContextCleaner reclaims each
            # checkpoint's blocks once the caller's plans are garbage.
            self.store.drop_event_generations()
        else:
            self.store.release_event_generations()
        self._history_handed_out = False

    def history(self) -> DataFrame:
        # a handed-out plan pins the current in-memory branches (and,
        # through them, the superseded merge checkpoints) — record that
        # so the next spill takes the GC-safe path instead of freeing
        if self._history_appends > 0:
            self._history_handed_out = True
        if self._history_base is not None:
            return self._history_base.unionByName(self._history)
        return self._history

    # -- persistence --------------------------------------------------------

    def save_state(self, base_path: str) -> None:
        """Persist the engine's full state: configs/templates/jobs as
        JSON (they are Firestore-document sized in the reference —
        TagEngineStoreHandler.py:366-1131), tags and history as parquet."""
        import json
        import os

        os.makedirs(base_path, exist_ok=True)

        def default(o):
            if isinstance(o, datetime.datetime):
                return {"__dt__": o.isoformat()}
            if isinstance(o, (set, frozenset)):
                # config kwargs may carry sets; order them for a
                # deterministic snapshot (they reload as lists)
                return sorted(o)
            raise TypeError(type(o))

        meta = {
            "templates": self.templates,
            "configs": self.configs,
            "jobs": self.jobs,
            "job_metadata": self._job_metadata,
            "seq": self._seq,
            "settings": self.settings,
        }
        with open(os.path.join(base_path, "meta.json"), "w") as f:
            json.dump(meta, f, default=default)
        self.store._df.write.mode("overwrite").parquet(os.path.join(base_path, "tags"))
        self.history().write.mode("overwrite").parquet(os.path.join(base_path, "history"))

    @classmethod
    def load_state(cls, spark: SparkSession, base_path: str, qualify=None) -> "TagEngine":
        import json
        import os

        def hook(d):
            if "__dt__" in d:
                return datetime.datetime.fromisoformat(d["__dt__"])
            return d

        eng = cls(spark, qualify=qualify)
        with open(os.path.join(base_path, "meta.json")) as f:
            meta = json.load(f, object_hook=hook)
        eng.templates = meta["templates"]
        eng.configs = meta["configs"]
        eng.jobs = meta["jobs"]
        eng._job_metadata = meta.get("job_metadata", [])
        eng._seq = meta["seq"]
        # older snapshots predate the settings store: keep the
        # constructor default (tag_history enabled)
        eng.settings = meta.get("settings", eng.settings)
        # set_state keeps the store's driver-resident mirror in sync —
        # without it the next merge would take the empty-store fast path
        # and duplicate same-key tags
        eng.store.set_state(spark.read.parquet(os.path.join(base_path, "tags")))
        eng._history = spark.read.parquet(os.path.join(base_path, "history"))
        return eng

    def jobs_df(self) -> DataFrame:
        from .model.schemas import JOBS_SCHEMA

        return local_df(self.spark, self.jobs, JOBS_SCHEMA)

    def jobs_by_config(self, config_uuid: str) -> DataFrame:
        """O5 (reference TagEngineStoreHandler.py:1238-1247): one
        config's jobs, most recent completion first."""
        return (
            self.jobs_df()
            .filter(F.col("config_uuid") == config_uuid)
            .orderBy(F.desc("completion_time"))
        )

    def active_configs(self) -> list[dict]:
        """O5 (reference TagEngineStoreHandler.py:1345-1356): non-INACTIVE
        configs ordered by config_status desc (driver-side — config
        metadata is always driver-resident and tiny)."""
        return sorted(
            (c for c in self.configs.values() if c["config_status"] != "INACTIVE"),
            key=lambda c: c["config_status"],
            reverse=True,
        )

    def delete_config(self, config_uuid: str, config_type: str | None = None) -> bool:
        """Config hard-delete (reference TagEngineStoreHandler.py:
        1286-1314 via main.py:3235 /delete_config): False when the uuid
        does not exist or the supplied config_type does not match the
        stored one (the reference resolves the collection from the type,
        so a wrong type is a miss); True after removal. Job-ledger rows
        for past runs are kept — the reference deletes only the config
        document."""
        cfg = self.configs.get(config_uuid)
        if cfg is None or (config_type is not None and cfg["config_type"] != config_type):
            return False
        del self.configs[config_uuid]
        return True

    def purge_inactive_configs(self, config_type: str = "ALL") -> int:
        """Bulk-delete INACTIVE configs of one type, or every type for
        'ALL' (reference TagEngineStoreHandler.py:1317-1343 via
        main.py:3296 /purge_inactive_configs); returns the deleted
        count. Configs go INACTIVE when a newer config with the same
        (type, template, uris) hash supersedes them (P11), so this is
        the reference's cleanup for superseded-config buildup."""
        doomed = [
            uuid
            for uuid, c in self.configs.items()
            if c["config_status"] == "INACTIVE"
            and (config_type == "ALL" or c["config_type"] == config_type)
        ]
        for uuid in doomed:
            del self.configs[uuid]
        return len(doomed)

    # -- settings (reference settings collection) --------------------------

    def set_settings(self, doc: str, **values) -> None:
        """Write one settings document (reference doc_ref.set semantics:
        full replace, TagEngineStoreHandler.py:65-183). Documents:
        a user email (default template coordinates), 'tag_history',
        'job_metadata', 'coverage_report'. Values must persist through
        the JSON snapshot, so sets/tuples normalize to sorted lists at
        write time rather than failing later inside save_state; stored
        values are copies, detached from the caller's objects."""
        import copy

        self.settings[doc] = {
            k: sorted(copy.deepcopy(v))
            if isinstance(v, (set, frozenset))
            else copy.deepcopy(list(v))
            if isinstance(v, tuple)
            else copy.deepcopy(v)
            for k, v in values.items()
        }

    def get_settings(self, doc: str) -> tuple[bool, dict]:
        """(exists, settings) like the reference's read_* pairs
        (TagEngineStoreHandler.py:50-62). Returns a COPY — the
        reference's read is a document snapshot; mutating it must not
        edit engine state behind set_settings' full-replace contract."""
        import copy

        s = self.settings.get(doc)
        return (s is not None), copy.deepcopy(s) if s else {}

    def tag_history_enabled(self) -> bool:
        """Gate on history appends (reference read_tag_history_settings,
        TagEngineStoreHandler.py:79-93: enabled only when the settings
        doc exists and says so). Tagging itself never depends on it."""
        return bool(self.settings.get("tag_history", {}).get("enabled"))

    def coverage_report(self, assets: DataFrame) -> DataFrame:
        """Settings-driven coverage report (reference main.py
        /coverage_report + generate_coverage_report,
        TagEngineStoreHandler.py:185-253): restrict assets to the
        configured included projects, apply the configured
        dataset/table exclusions, roll up per dataset. Unconfigured =
        report everything (no projects filter, no exclusions)."""
        from .operators.coverage import coverage_report as _report

        _, s = self.get_settings("coverage_report")
        included = s.get("included_projects")
        if included is not None:
            # configured-but-empty means "no projects onboarded": an
            # EMPTY report, not an everything report (the reference
            # iterates the configured list, so [] yields nothing)
            assets = assets.filter(
                F.col("project").isin(list(included)) if included else F.lit(False)
            )
        return _report(
            assets,
            self.store.all(),
            excluded_datasets=s.get("excluded_datasets"),
            excluded_tables=s.get("excluded_tables"),
        )

    def recent_log_entries(self, limit: int = 25) -> DataFrame:
        """O6 (reference main.py:195-225 get_log_entries): the latest
        ``limit`` audit entries, newest first, payload truncated to 120
        chars. The reference tails Cloud Logging; the engine's audit
        stream is the tag history."""
        payload = F.concat_ws(
            " ", F.col("action"), F.col("asset_name"), F.col("field_id"), F.col("field_value")
        )
        return (
            self.history()
            .orderBy(F.desc("event_time"), F.asc("asset_name"), F.asc("field_id"))
            .limit(limit)
            .select("event_time", F.substring(payload, 1, 120).alias("payload"))
        )

    def ready_configs(self, now: datetime.datetime) -> list[dict]:
        """P10: AUTO + ACTIVE + READY + next_run <= now."""
        return [
            c
            for c in self.configs.values()
            if c.get("refresh_mode") == "AUTO"
            and c["config_status"] == "ACTIVE"
            and c["scheduling_status"] == "READY"
            and c.get("next_run") is not None
            and c["next_run"] <= now
        ]

    def run_ready_configs(self, assets: DataFrame, now: datetime.datetime | None = None, **kw) -> list[str]:
        """T1: the cron path — run every ready config, bump version and
        next_run += frequency (TagEngineStoreHandler.py:290-309).

        Each config runs isolated, like the reference's one-Cloud-Task-
        per-config dispatch: a failing config gets its ERROR ledger row
        (written by trigger_job) and its scheduling_status restored so
        the next cycle retries it, and the remaining ready configs
        still run. The incremental flag is dropped for config types it
        cannot apply to — on the cron path that's a per-type
        optimization toggle, not a per-call contract violation."""
        now = now or datetime.datetime.now(datetime.timezone.utc)
        job_ids = []
        for cfg in self.ready_configs(now):
            cfg["scheduling_status"] = "PENDING"
            cfg["version"] += 1
            step = cfg.get("refresh_frequency", 24) * _REFRESH_UNITS.get(
                cfg.get("refresh_unit", "hours"), 3600
            )
            cfg["next_run"] = cfg["next_run"] + datetime.timedelta(seconds=step)
            per_kw = dict(kw)
            if cfg["config_type"] in _NON_INCREMENTAL_TYPES:
                per_kw.pop("incremental", None)
            try:
                job_ids.append(self.trigger_job(cfg["config_uuid"], assets, **per_kw))
            except Exception as exc:
                cfg["scheduling_status"] = "READY"
                if not getattr(exc, "_ledger_recorded", False):
                    # the raise happened before trigger_job's ledger
                    # writes (validation, bad dispatch — trigger_job
                    # stamps _ledger_recorded on exceptions whose row it
                    # already wrote): record the failure here so no cron
                    # failure is ever silent
                    self._record_job(
                        self._uuid("job"), cfg["config_uuid"],
                        cfg["config_type"],
                        datetime.datetime.now(datetime.timezone.utc),
                        status="ERROR", tasks_failed=1,
                        errors=[("scheduler", repr(exc))],
                    )
        return job_ids
