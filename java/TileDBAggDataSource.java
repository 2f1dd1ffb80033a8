// Unified JVM DataSource V2 shim for the native-array tier.
//
// The Python DataSource API has no SupportsPushDownAggregates hook, so a
// plain `SELECT COUNT(*)` over format("tiledb_native") full-scans (the
// documented q310 gap).  This Java provider closes the group_by_handler
// behaviors (TileDB-MariaDB mytile/ha_mytile.cc:607-715) unreachable
// from plain SQL, and (round 8) serves the SCAN path too so the two
// formats stop being a user-visible seam:
//
// - ungrouped COUNT(*) / MIN / MAX / SUM / AVG answered ENTIRELY from
//   fragment metadata (count_native_array / attr_stats_native_array /
//   windowed_agg_native — same trust rules, never a guessed value);
// - GROUP BY dim0 or FLOOR(dim0 / width) rollups from
//   bucketed_agg_native (footer walk + edge-tile decode, the q340
//   metadata rollup behind plain SQL);
// - aggregates COMPOSE with pushed filters, mirroring the reference's
//   range-stealing (the group_by_handler consumes the already-pushed
//   ranges + conditions, ha_mytile.cc:634-640): pushed dim-range
//   conjuncts window the metadata aggregate, anything else falls back;
// - filter pushdown (=, <, <=, >, >=, IN, IS [NOT] NULL, != — applied
//   EXACTLY by the Python decoder, so accepted filters carry no Spark
//   residual) and column pruning on the row scan, with the split plan
//   intersected with pushed dim ranges + the condition-NED (zero
//   partitions when provably empty).
//
// All delegation goes through a tiny subprocess bridge
// (tiledb_mariadb_spark.tools.jvm_bridge) into the repo's pure-Python
// decoder (JSON-lines rows; the big-scan fast path remains the Python
// datasource — this format exists for the pushdown contract).
//
// Build/registration: tiledb_mariadb_spark.sources.jvm_agg compiles this
// file against the installed pyspark jars and loads it with ADD JAR, so
// `spark.read.format("tiledb_agg")` works in any session of this repo.

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;
import java.io.BufferedInputStream;
import java.io.BufferedReader;
import java.io.InputStreamReader;
import org.apache.arrow.memory.BufferAllocator;
import org.apache.arrow.memory.RootAllocator;
import org.apache.arrow.vector.VectorSchemaRoot;
import org.apache.arrow.vector.ipc.ArrowStreamReader;
import java.io.Serializable;
import java.math.BigDecimal;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import java.util.OptionalLong;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableProvider;
import org.apache.spark.sql.connector.expressions.Expression;
import org.apache.spark.sql.connector.expressions.GeneralScalarExpression;
import org.apache.spark.sql.connector.expressions.Literal;
import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.NullOrdering;
import org.apache.spark.sql.connector.expressions.SortDirection;
import org.apache.spark.sql.connector.expressions.SortOrder;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc;
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation;
import org.apache.spark.sql.connector.expressions.aggregate.Avg;
import org.apache.spark.sql.connector.expressions.aggregate.Count;
import org.apache.spark.sql.connector.expressions.aggregate.CountStar;
import org.apache.spark.sql.connector.expressions.aggregate.Max;
import org.apache.spark.sql.connector.expressions.aggregate.Min;
import org.apache.spark.sql.connector.expressions.aggregate.Sum;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.Statistics;
import org.apache.spark.sql.connector.read.SupportsPushDownAggregates;
import org.apache.spark.sql.connector.read.SupportsPushDownFilters;
import org.apache.spark.sql.connector.read.SupportsPushDownLimit;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.connector.read.SupportsPushDownTopN;
import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.connector.read.SupportsReportStatistics;
import org.apache.spark.sql.sources.DataSourceRegister;
import org.apache.spark.sql.sources.EqualNullSafe;
import org.apache.spark.sql.sources.EqualTo;
import org.apache.spark.sql.sources.Filter;
import org.apache.spark.sql.sources.GreaterThan;
import org.apache.spark.sql.sources.GreaterThanOrEqual;
import org.apache.spark.sql.sources.In;
import org.apache.spark.sql.sources.IsNotNull;
import org.apache.spark.sql.sources.IsNull;
import org.apache.spark.sql.sources.LessThan;
import org.apache.spark.sql.sources.LessThanOrEqual;
import org.apache.spark.sql.sources.Not;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;
import org.apache.spark.sql.vectorized.ArrowColumnVector;
import org.apache.spark.sql.vectorized.ColumnVector;
import org.apache.spark.sql.vectorized.ColumnarBatch;
import org.apache.spark.unsafe.types.UTF8String;

public class TileDBAggDataSource implements TableProvider, DataSourceRegister {

  @Override
  public String shortName() {
    return "tiledb_agg";
  }

  @Override
  public StructType inferSchema(CaseInsensitiveStringMap options) {
    Bridge b = Bridge.fromOptions(options);
    JsonNode out = b.call("schema", null, null, null);
    if (out == null || !out.path("ok").asBoolean(false)) {
      throw new RuntimeException(
          "tiledb_agg: schema bridge failed for " + b.uri
              + (out == null ? "" : ": " + out.path("reason").asText()));
    }
    return StructType.fromDDL(out.path("ddl").asText());
  }

  @Override
  public Table getTable(
      StructType schema, Transform[] partitioning, Map<String, String> properties) {
    return new AggTable(schema, new CaseInsensitiveStringMap(properties));
  }

  // ---- bridge -------------------------------------------------------------

  /** One subprocess call into the repo's Python decoder. */
  static class Bridge implements Serializable {
    final String python;
    final String pythonPath;
    final String uri;
    final String at;
    final String encryptionKey;

    Bridge(String python, String pythonPath, String uri, String at, String key) {
      this.python = python;
      this.pythonPath = pythonPath;
      this.uri = uri;
      this.at = at;
      this.encryptionKey = key;
    }

    static Bridge fromOptions(CaseInsensitiveStringMap o) {
      String uri = o.get("path");
      if (uri == null) {
        throw new IllegalArgumentException("tiledb_agg: option 'path' is required");
      }
      return new Bridge(
          o.getOrDefault("python", "python3"),
          o.getOrDefault("pythonpath", ""),
          uri,
          o.get("at"),
          o.get("encryption_key"));
    }

    Process start(
        String cmd,
        String aggs,
        String rangesJson,
        String condsJson,
        String columnsJson,
        String group) {
      return start(cmd, aggs, rangesJson, condsJson, columnsJson, group, null);
    }

    Process start(
        String cmd,
        String aggs,
        String rangesJson,
        String condsJson,
        String columnsJson,
        String group,
        Integer limit) {
      List<String> argv = new ArrayList<>();
      argv.add(python);
      argv.add("-m");
      argv.add("tiledb_mariadb_spark.tools.jvm_bridge");
      argv.add(cmd);
      argv.add("--uri");
      argv.add(uri);
      if (at != null) {
        argv.add("--at");
        argv.add(at);
      }
      if (encryptionKey != null) {
        argv.add("--encryption-key");
        argv.add(encryptionKey);
      }
      if (aggs != null) {
        argv.add("--aggs");
        argv.add(aggs);
      }
      if (rangesJson != null) {
        argv.add("--ranges");
        argv.add(rangesJson);
      }
      if (condsJson != null) {
        argv.add("--conditions");
        argv.add(condsJson);
      }
      if (columnsJson != null) {
        argv.add("--columns");
        argv.add(columnsJson);
      }
      if (group != null) {
        argv.add("--group");
        argv.add(group);
      }
      if (limit != null) {
        argv.add("--limit");
        argv.add(String.valueOf(limit));
      }
      ProcessBuilder pb = new ProcessBuilder(argv);
      if (!pythonPath.isEmpty()) {
        pb.environment().put("PYTHONPATH", pythonPath);
      }
      pb.redirectErrorStream(false);
      try {
        return pb.start();
      } catch (Exception e) {
        throw new RuntimeException("tiledb_agg: cannot launch bridge: " + e, e);
      }
    }

    Process startWithFrags(String cmd, String fragsJson) {
      List<String> argv = new ArrayList<>();
      argv.add(python);
      argv.add("-m");
      argv.add("tiledb_mariadb_spark.tools.jvm_bridge");
      argv.add(cmd);
      argv.add("--uri");
      argv.add(uri);
      if (encryptionKey != null) {
        argv.add("--encryption-key");
        argv.add(encryptionKey);
      }
      argv.add("--frags");
      argv.add(fragsJson);
      ProcessBuilder pb = new ProcessBuilder(argv);
      if (!pythonPath.isEmpty()) {
        pb.environment().put("PYTHONPATH", pythonPath);
      }
      pb.redirectErrorStream(false);
      try {
        return pb.start();
      } catch (Exception e) {
        throw new RuntimeException("tiledb_agg: cannot launch bridge: " + e, e);
      }
    }

    JsonNode callTopK(String spec, String condsJson) {
      List<String> argv = new ArrayList<>();
      argv.add(python);
      argv.add("-m");
      argv.add("tiledb_mariadb_spark.tools.jvm_bridge");
      argv.add("topk");
      argv.add("--uri");
      argv.add(uri);
      if (at != null) {
        argv.add("--at");
        argv.add(at);
      }
      if (encryptionKey != null) {
        argv.add("--encryption-key");
        argv.add(encryptionKey);
      }
      argv.add("--topk");
      argv.add(spec);
      if (condsJson != null) {
        argv.add("--conditions");
        argv.add(condsJson);
      }
      ProcessBuilder pb = new ProcessBuilder(argv);
      if (!pythonPath.isEmpty()) {
        pb.environment().put("PYTHONPATH", pythonPath);
      }
      try {
        Process p = pb.start();
        String out =
            new String(p.getInputStream().readAllBytes(), StandardCharsets.UTF_8);
        p.waitFor();
        return out.isEmpty() ? null : new ObjectMapper().readTree(out);
      } catch (Exception e) {
        return null;
      }
    }

    /** Single-JSON-object commands (schema / agg / gagg / splits).
     * null on launch failure. */
    JsonNode call(String cmd, String aggs, String condsJson, String group) {
      try {
        Process p = start(cmd, aggs, null, condsJson, null, group);
        String out =
            new String(p.getInputStream().readAllBytes(), StandardCharsets.UTF_8);
        p.waitFor();
        if (out.isEmpty()) {
          return null;
        }
        return new ObjectMapper().readTree(out);
      } catch (Exception e) {
        return null;
      }
    }
  }

  // ---- shared JSON -> Spark value conversion --------------------------------

  static Object jsonToSpark(JsonNode v, DataType t) {
    if (v == null || v.isNull()) {
      return null;
    }
    if (t == DataTypes.StringType) {
      return UTF8String.fromString(v.asText());
    }
    if (t == DataTypes.LongType) {
      return v.asLong();
    }
    if (t == DataTypes.IntegerType) {
      return (int) v.asLong();
    }
    if (t == DataTypes.ShortType) {
      return (short) v.asLong();
    }
    if (t == DataTypes.ByteType) {
      return (byte) v.asLong();
    }
    if (t == DataTypes.DoubleType) {
      return v.asDouble();
    }
    if (t == DataTypes.FloatType) {
      return (float) v.asDouble();
    }
    if (t == DataTypes.BooleanType) {
      return v.asBoolean();
    }
    throw new RuntimeException("tiledb_agg: unsupported type " + t);
  }

  // ---- table / scan builder ------------------------------------------------

  static class AggTable implements Table, SupportsRead, SupportsWrite {
    private final StructType schema;
    private final CaseInsensitiveStringMap options;

    AggTable(StructType schema, CaseInsensitiveStringMap options) {
      this.schema = schema;
      this.options = options;
    }

    @Override
    public String name() {
      return "tiledb_agg(" + options.get("path") + ")";
    }

    @Override
    public StructType schema() {
      return schema;
    }

    @Override
    public java.util.Set<TableCapability> capabilities() {
      return java.util.EnumSet.of(
          TableCapability.BATCH_READ, TableCapability.BATCH_WRITE);
    }

    @Override
    public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      StructType in = info.schema();
      StructField[] want = schema.fields();
      if (in.fields().length != want.length) {
        throw new IllegalArgumentException(
            "tiledb_agg write: dataframe has " + in.fields().length
                + " columns, table has " + want.length);
      }
      for (int i = 0; i < want.length; i++) {
        if (!in.fields()[i].name().equals(want[i].name())) {
          throw new IllegalArgumentException(
              "tiledb_agg write: column " + i + " is '"
                  + in.fields()[i].name() + "', table wants '"
                  + want[i].name() + "' (order matters: dims first, "
                  + "then attributes in schema order)");
        }
      }
      CaseInsensitiveStringMap eff =
          info.options().containsKey("path") ? info.options() : options;
      return new AggWriteBuilder(schema, eff);
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap o) {
      // o carries the read options (path etc.); table options as fallback
      CaseInsensitiveStringMap eff = o.containsKey("path") ? o : options;
      return new AggScanBuilder(schema, eff);
    }
  }

  static class AggScanBuilder
      implements ScanBuilder,
          SupportsPushDownAggregates,
          SupportsPushDownFilters,
          SupportsPushDownLimit,
          SupportsPushDownRequiredColumns,
          SupportsPushDownTopN {
    private final StructType tableSchema;
    private final CaseInsensitiveStringMap options;
    private StructType required = null; // pruned projection (null = all)
    private final List<List<Object>> conds = new ArrayList<>();
    private Filter[] accepted = new Filter[0];
    private StructType aggSchema = null;
    private List<Object[]> aggRows = null;
    private boolean aggGrouped = false;
    private Integer limit = null;

    @Override
    public boolean pushLimit(int n) {
      // advisory: each split truncates its survivors to n rows (wire +
      // Arrow cost shrink); Spark still applies the global limit, so
      // returning false keeps semantics exact.  (Only reached for a
      // bare LIMIT — Spark routes ORDER BY ... LIMIT to pushTopN.)
      this.limit = n;
      return false;
    }

    @Override
    public boolean isPartiallyPushed() {
      // both pushLimit and pushTopN here are partial: Spark keeps the
      // exact global limit (and sort) above the scan
      return true;
    }

    /** ORDER BY col LIMIT n: the zone-map bound (topk_array's
     * metadata walk, tiledb_native.py::topk_threshold) rides back as
     * an ordinary pushed condition, so fragment/tile skip and
     * condition-NED planning prune everything provably outside the
     * top-n.  Partially pushed (default): Spark keeps the exact sort +
     * limit above the scan.  NO per-split row truncation here — the
     * top-n by col can live anywhere in a split. */
    @Override
    public boolean pushTopN(SortOrder[] orders, int n) {
      if (aggRows != null || orders.length != 1) {
        return false;
      }
      SortOrder o = orders[0];
      String col = singleColumn(o.expression());
      if (col == null || fieldType(col) == null) {
        return false;
      }
      boolean asc = o.direction() == SortDirection.ASCENDING;
      // the pushed threshold condition drops NULLs (3VL): only safe
      // when NULLs sort LAST (they can never be in the guaranteed
      // top-n) or the column cannot hold them
      boolean nullable = true;
      for (StructField f : tableSchema.fields()) {
        if (f.name().equals(col)) {
          nullable = f.nullable();
        }
      }
      if (nullable && o.nullOrdering() != NullOrdering.NULLS_LAST) {
        return false;
      }
      Bridge b = Bridge.fromOptions(options);
      JsonNode out =
          b.callTopK(col + ":" + (asc ? "asc" : "desc") + ":" + n, condsJson());
      if (out != null
          && out.path("ok").asBoolean(false)
          && out.hasNonNull("thr")) {
        JsonNode thr = out.path("thr");
        Object v;
        if (thr.isTextual()) {
          v = thr.asText();
        } else if (thr.isIntegralNumber()) {
          v = thr.asLong();
        } else if (thr.isNumber()) {
          v = thr.asDouble();
        } else {
          return true; // unexpected shape: topN accepted, no pruning
        }
        List<Object> c = new ArrayList<>();
        c.add(col);
        c.add(asc ? "<=" : ">=");
        c.add(v);
        conds.add(c);
      }
      return true;
    }

    AggScanBuilder(StructType tableSchema, CaseInsensitiveStringMap options) {
      this.tableSchema = tableSchema;
      this.options = options;
    }

    private static String singleColumn(Expression e) {
      if (e instanceof NamedReference) {
        String[] parts = ((NamedReference) e).fieldNames();
        if (parts.length == 1) {
          return parts[0];
        }
      }
      return null;
    }

    private DataType fieldType(String name) {
      for (StructField f : tableSchema.fields()) {
        if (f.name().equalsIgnoreCase(name)) {
          return f.dataType();
        }
      }
      return null;
    }

    private static boolean integral(DataType t) {
      return t == DataTypes.ByteType
          || t == DataTypes.ShortType
          || t == DataTypes.IntegerType
          || t == DataTypes.LongType;
    }

    // ---- filter pushdown ---------------------------------------------------

    private static boolean okValue(Object v) {
      return v instanceof Integer
          || v instanceof Long
          || v instanceof Short
          || v instanceof Byte
          || v instanceof Double
          || v instanceof Float
          || v instanceof String
          || v instanceof Boolean;
    }

    /** v1 Filter -> bridge condition triple, or null when not
     * expressible.  The Python side applies accepted conditions
     * EXACTLY (3VL: NULL fails every comparison, like Spark), so they
     * carry no residual. */
    private List<Object> translate(Filter f) {
      if (f instanceof EqualTo) {
        EqualTo e = (EqualTo) f;
        if (fieldType(e.attribute()) != null && okValue(e.value())) {
          return List.of(e.attribute(), "=", e.value());
        }
      } else if (f instanceof EqualNullSafe) {
        EqualNullSafe e = (EqualNullSafe) f;
        if (fieldType(e.attribute()) != null) {
          if (e.value() == null) {
            return List.of(e.attribute(), "is_null");
          }
          if (okValue(e.value())) {
            // c <=> v with v non-null == (c = v AND c IS NOT NULL),
            // exactly the decoder's "=" mask
            return List.of(e.attribute(), "=", e.value());
          }
        }
      } else if (f instanceof GreaterThan) {
        GreaterThan e = (GreaterThan) f;
        if (fieldType(e.attribute()) != null && okValue(e.value())) {
          return List.of(e.attribute(), ">", e.value());
        }
      } else if (f instanceof GreaterThanOrEqual) {
        GreaterThanOrEqual e = (GreaterThanOrEqual) f;
        if (fieldType(e.attribute()) != null && okValue(e.value())) {
          return List.of(e.attribute(), ">=", e.value());
        }
      } else if (f instanceof LessThan) {
        LessThan e = (LessThan) f;
        if (fieldType(e.attribute()) != null && okValue(e.value())) {
          return List.of(e.attribute(), "<", e.value());
        }
      } else if (f instanceof LessThanOrEqual) {
        LessThanOrEqual e = (LessThanOrEqual) f;
        if (fieldType(e.attribute()) != null && okValue(e.value())) {
          return List.of(e.attribute(), "<=", e.value());
        }
      } else if (f instanceof In) {
        In e = (In) f;
        if (fieldType(e.attribute()) != null) {
          List<Object> vals = new ArrayList<>();
          for (Object v : e.values()) {
            if (v == null) {
              continue; // IN's NULL member never matches (3VL)
            }
            if (!okValue(v)) {
              return null;
            }
            vals.add(v);
          }
          return List.of(e.attribute(), "in", vals);
        }
      } else if (f instanceof IsNull) {
        IsNull e = (IsNull) f;
        if (fieldType(e.attribute()) != null) {
          return List.of(e.attribute(), "is_null");
        }
      } else if (f instanceof IsNotNull) {
        IsNotNull e = (IsNotNull) f;
        if (fieldType(e.attribute()) != null) {
          return List.of(e.attribute(), "is_not_null");
        }
      } else if (f instanceof Not && ((Not) f).child() instanceof EqualTo) {
        EqualTo e = (EqualTo) ((Not) f).child();
        if (fieldType(e.attribute()) != null && okValue(e.value())) {
          return List.of(e.attribute(), "!=", e.value());
        }
      }
      return null;
    }

    @Override
    public Filter[] pushFilters(Filter[] filters) {
      List<Filter> residual = new ArrayList<>();
      List<Filter> ok = new ArrayList<>();
      for (Filter f : filters) {
        List<Object> c = translate(f);
        if (c != null) {
          conds.add(c);
          ok.add(f);
        } else {
          residual.add(f);
        }
      }
      accepted = ok.toArray(new Filter[0]);
      return residual.toArray(new Filter[0]);
    }

    @Override
    public Filter[] pushedFilters() {
      return accepted;
    }

    private String condsJson() {
      if (conds.isEmpty()) {
        return null;
      }
      try {
        return new ObjectMapper().writeValueAsString(conds);
      } catch (Exception e) {
        throw new RuntimeException("tiledb_agg: conditions JSON: " + e, e);
      }
    }

    // ---- column pruning ----------------------------------------------------

    @Override
    public void pruneColumns(StructType requiredSchema) {
      this.required = requiredSchema;
    }

    // ---- aggregate pushdown ------------------------------------------------

    @Override
    public boolean supportCompletePushDown(Aggregation aggregation) {
      return tryPush(aggregation);
    }

    @Override
    public boolean pushAggregation(Aggregation aggregation) {
      return aggRows != null || tryPush(aggregation);
    }

    private static Expression unwrapCast(Expression e) {
      while (e instanceof org.apache.spark.sql.connector.expressions.Cast) {
        e = ((org.apache.spark.sql.connector.expressions.Cast) e).expression();
      }
      return e;
    }

    /** Match FLOOR(col / width) (modulo casts) -> {col, width}, else
     * null.  This is the V2 shape Catalyst emits for the SQL bucketed
     * rollup `GROUP BY FLOOR(k / 100)`. */
    private Object[] matchFloorDiv(Expression e) {
      e = unwrapCast(e);
      if (!(e instanceof GeneralScalarExpression)) {
        return null;
      }
      GeneralScalarExpression fl = (GeneralScalarExpression) e;
      if (!"FLOOR".equals(fl.name()) || fl.children().length != 1) {
        return null;
      }
      Expression div = unwrapCast(fl.children()[0]);
      if (!(div instanceof GeneralScalarExpression)) {
        return null;
      }
      GeneralScalarExpression d = (GeneralScalarExpression) div;
      if (!"/".equals(d.name()) || d.children().length != 2) {
        return null;
      }
      String col = singleColumn(unwrapCast(d.children()[0]));
      Expression rhs = unwrapCast(d.children()[1]);
      if (col == null || !(rhs instanceof Literal)) {
        return null;
      }
      Object w = ((Literal<?>) rhs).value();
      long width;
      try {
        BigDecimal bd = new BigDecimal(String.valueOf(w));
        if (bd.stripTrailingZeros().scale() > 0) {
          return null; // fractional width: not an integer bucket grid
        }
        width = bd.longValueExact();
      } catch (Exception ex) {
        return null;
      }
      if (width <= 0) {
        return null;
      }
      return new Object[] {col, width};
    }

    private boolean tryPush(Aggregation aggregation) {
      if (aggRows != null) {
        return true;
      }
      Expression[] groups = aggregation.groupByExpressions();
      // each group expr: a plain integral column (width-1 buckets) or
      // FLOOR(col / width); multiple groups form an N-D grid rollup
      List<String> groupCols = new ArrayList<>();
      List<Long> groupWidths = new ArrayList<>();
      List<DataType> groupTypes = new ArrayList<>();
      for (Expression g : groups) {
        String c = singleColumn(g);
        long w;
        DataType gt;
        if (c != null) {
          DataType t = fieldType(c);
          if (t == null || !integral(t)) {
            return false;
          }
          w = 1;
          gt = t;
        } else {
          Object[] fd = matchFloorDiv(g);
          if (fd == null) {
            return false;
          }
          c = (String) fd[0];
          w = (Long) fd[1];
          DataType t = fieldType(c);
          if (t == null || !integral(t)) {
            return false;
          }
          gt = DataTypes.LongType; // FLOOR(double) is LONG
        }
        if (groupCols.contains(c)) {
          return false; // one bucketing per column
        }
        groupCols.add(c);
        groupWidths.add(w);
        groupTypes.add(gt);
      }
      List<String> reqs = new ArrayList<>();
      List<DataType> types = new ArrayList<>();
      for (AggregateFunc f : aggregation.aggregateExpressions()) {
        if (f instanceof CountStar) {
          reqs.add("count");
          types.add(DataTypes.LongType);
        } else if (f instanceof Min) {
          String c = singleColumn(((Min) f).column());
          DataType t = c == null ? null : fieldType(c);
          if (t == null) {
            return false;
          }
          reqs.add("min:" + c);
          types.add(t);
        } else if (f instanceof Max) {
          String c = singleColumn(((Max) f).column());
          DataType t = c == null ? null : fieldType(c);
          if (t == null) {
            return false;
          }
          reqs.add("max:" + c);
          types.add(t);
        } else if (f instanceof Sum) {
          Sum s = (Sum) f;
          String c = singleColumn(s.column());
          DataType t = c == null ? null : fieldType(c);
          if (s.isDistinct() || t == null) {
            return false;
          }
          if (!integral(t) && t != DataTypes.DoubleType && t != DataTypes.FloatType) {
            return false;
          }
          reqs.add("sum:" + c);
          types.add(integral(t) ? DataTypes.LongType : DataTypes.DoubleType);
        } else if (f instanceof Avg) {
          Avg a = (Avg) f;
          String c = singleColumn(a.column());
          DataType t = c == null ? null : fieldType(c);
          if (a.isDistinct() || t == null) {
            return false;
          }
          if (!integral(t) && t != DataTypes.DoubleType && t != DataTypes.FloatType) {
            return false;
          }
          reqs.add("avg:" + c);
          types.add(DataTypes.DoubleType);
        } else if (f instanceof Count) {
          Count cf = (Count) f;
          String c = singleColumn(cf.column());
          if (cf.isDistinct() || c == null || fieldType(c) == null) {
            return false;
          }
          reqs.add("countcol:" + c);
          types.add(DataTypes.LongType);
        } else {
          return false;
        }
      }
      Bridge b = Bridge.fromOptions(options);
      String cj = condsJson();
      List<Object[]> rows = new ArrayList<>();
      List<StructField> fields = new ArrayList<>();
      int off = 0;
      if (groupCols.isEmpty()) {
        JsonNode out = b.call("agg", String.join(";", reqs), cj, null);
        if (out == null || !out.path("ok").asBoolean(false)) {
          return false; // metadata cannot prove it: honest scan fallback
        }
        JsonNode vals = out.path("values");
        if (!vals.isArray() || vals.size() != reqs.size()) {
          return false;
        }
        Object[] row = new Object[reqs.size()];
        for (int i = 0; i < reqs.size(); i++) {
          try {
            row[i] = jsonToSpark(vals.get(i), types.get(i));
          } catch (RuntimeException ex) {
            return false; // unexpected stat type
          }
        }
        rows.add(row);
      } else {
        StringBuilder gspec = new StringBuilder();
        for (int i = 0; i < groupCols.size(); i++) {
          if (i > 0) {
            gspec.append(",");
          }
          gspec.append(groupCols.get(i)).append(":").append(groupWidths.get(i));
        }
        JsonNode out =
            b.call("gagg", String.join(";", reqs), cj, gspec.toString());
        if (out == null || !out.path("ok").asBoolean(false)) {
          return false;
        }
        JsonNode jrows = out.path("rows");
        if (!jrows.isArray()) {
          return false;
        }
        int ng = groupCols.size();
        for (JsonNode jr : jrows) {
          if (!jr.isArray() || jr.size() != reqs.size() + ng) {
            return false;
          }
          Object[] row = new Object[reqs.size() + ng];
          try {
            // width-1 buckets ARE the coordinate; FLOOR buckets are LONG
            for (int i = 0; i < ng; i++) {
              row[i] = jsonToSpark(jr.get(i), groupTypes.get(i));
            }
            for (int i = 0; i < reqs.size(); i++) {
              row[i + ng] = jsonToSpark(jr.get(i + ng), types.get(i));
            }
          } catch (RuntimeException ex) {
            return false;
          }
          rows.add(row);
        }
        for (int i = 0; i < ng; i++) {
          fields.add(
              new StructField(
                  "group_" + i,
                  groupTypes.get(i),
                  true,
                  org.apache.spark.sql.types.Metadata.empty()));
        }
        off = ng;
        aggGrouped = true;
      }
      for (int i = 0; i < reqs.size(); i++) {
        fields.add(
            new StructField(
                "agg_" + i, types.get(i), true, org.apache.spark.sql.types.Metadata.empty()));
      }
      this.aggRows = rows;
      this.aggSchema = new StructType(fields.toArray(new StructField[0]));
      // off is only informational (group cols precede aggs)
      if (off > 0 && aggSchema.fields().length != reqs.size() + off) {
        throw new IllegalStateException("tiledb_agg: grouped schema drift");
      }
      return true;
    }

    @Override
    public Scan build() {
      if (aggRows != null) {
        return new MetadataAggScan(aggSchema, aggRows, aggGrouped);
      }
      StructType s = required != null ? required : tableSchema;
      String columnsJson = null;
      if (required != null) {
        try {
          List<String> names = new ArrayList<>();
          for (StructField f : s.fields()) {
            names.add(f.name());
          }
          columnsJson = new ObjectMapper().writeValueAsString(names);
        } catch (Exception e) {
          throw new RuntimeException("tiledb_agg: columns JSON: " + e, e);
        }
      }
      return new RowScan(s, options, condsJson(), columnsJson, limit);
    }
  }

  // ---- metadata-aggregate scan: stat rows, zero/edge tiles decoded ----------

  static class MetadataAggScan implements Scan, Batch, SupportsReportStatistics {
    private final StructType schema;
    private final List<Object[]> rows;

    @Override
    public Statistics estimateStatistics() {
      final long n = rows.size();
      final long w = 8L * Math.max(1, schema.fields().length);
      return new Statistics() {
        @Override
        public OptionalLong sizeInBytes() {
          return OptionalLong.of(n * w);
        }

        @Override
        public OptionalLong numRows() {
          return OptionalLong.of(n);
        }
      };
    }
    private final boolean grouped;

    MetadataAggScan(StructType schema, List<Object[]> rows, boolean grouped) {
      this.schema = schema;
      this.rows = rows;
      this.grouped = grouped;
    }

    @Override
    public StructType readSchema() {
      return schema;
    }

    @Override
    public String description() {
      return grouped
          ? "TileDBMetadataAggScan(GroupedPushedAggregates)"
          : "TileDBMetadataAggScan(PushedAggregates)";
    }

    @Override
    public Batch toBatch() {
      return this;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      return new InputPartition[] {new StatRowsPartition(rows)};
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new StatRowsReaderFactory();
    }
  }

  static class StatRowsPartition implements InputPartition {
    final List<Object[]> rows;

    StatRowsPartition(List<Object[]> rows) {
      this.rows = rows;
    }
  }

  static class StatRowsReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition p) {
      List<Object[]> rows = ((StatRowsPartition) p).rows;
      return new PartitionReader<InternalRow>() {
        private int i = -1;

        @Override
        public boolean next() {
          i++;
          return i < rows.size();
        }

        @Override
        public InternalRow get() {
          return new GenericInternalRow(rows.get(i).clone());
        }

        @Override
        public void close() {}
      };
    }
  }

  // ---- row-scan path (bridge JSON-lines; filters exact, columns pruned) -----

  static class RowScan implements Scan, Batch, SupportsReportStatistics, SupportsRuntimeFiltering {
    private final StructType schema;
    private final Map<String, String> opts;
    private final String condsJson;
    private final String columnsJson;
    private final Integer limit;

    RowScan(
        StructType schema,
        CaseInsensitiveStringMap options,
        String condsJson,
        String columnsJson,
        Integer limit) {
      this.schema = schema;
      this.opts = new java.util.HashMap<>(options.asCaseSensitiveMap());
      this.condsJson = condsJson;
      this.columnsJson = columnsJson;
      this.limit = limit;
    }

    // runtime (DPP-style) conditions folded in AFTER planning starts:
    // a broadcast join side's dim values arrive as In()/EqualTo()
    // filters, become ordinary pushed conditions, and the split
    // planner's condition-NED + range folding then skips fragments and
    // plans zero tasks where no key lives (Iceberg-style file skip at
    // fragment granularity).  Exact application in the bridge keeps
    // semantics correct even if the values over-approximate.
    private String runtimeCondsJson = null;

    @Override
    public NamedReference[] filterAttributes() {
      StructField[] fields = schema.fields();
      NamedReference[] refs = new NamedReference[fields.length];
      for (int i = 0; i < fields.length; i++) {
        refs[i] = Expressions.column(fields[i].name());
      }
      return refs;
    }

    @Override
    public void filter(Filter[] filters) {
      List<List<Object>> conds = new ArrayList<>();
      for (Filter f : filters) {
        if (f instanceof In) {
          In in = (In) f;
          List<Object> c = new ArrayList<>();
          c.add(in.attribute());
          c.add("in");
          List<Object> vals = new ArrayList<>();
          for (Object v : in.values()) {
            if (!(v instanceof Number || v instanceof String || v instanceof Boolean)) {
              c = null;
              break;
            }
            vals.add(v);
          }
          if (c != null) {
            c.add(vals);
            conds.add(c);
          }
        } else if (f instanceof EqualTo) {
          EqualTo eq = (EqualTo) f;
          Object v = eq.value();
          if (v instanceof Number || v instanceof String || v instanceof Boolean) {
            List<Object> c = new ArrayList<>();
            c.add(eq.attribute());
            c.add("=");
            c.add(v);
            conds.add(c);
          }
        }
        // anything else: ignored — runtime filters are an optimization,
        // Spark re-applies them above the scan
      }
      if (conds.isEmpty()) {
        return;
      }
      try {
        ObjectMapper m = new ObjectMapper();
        List<Object> merged = new ArrayList<>();
        if (condsJson != null) {
          for (JsonNode n : m.readTree(condsJson)) {
            merged.add(m.treeToValue(n, Object.class));
          }
        }
        merged.addAll(conds);
        runtimeCondsJson = m.writeValueAsString(merged);
      } catch (Exception e) {
        runtimeCondsJson = null; // optimization only: fall back to planned conds
      }
    }

    private String effectiveConds() {
      return runtimeCondsJson != null ? runtimeCondsJson : condsJson;
    }

    // ONE planning spawn per query: the splits call piggybacks the
    // stats payload, cached here and keyed by the effective condition
    // set (runtime filters invalidate it)
    private transient JsonNode planOut;
    private transient String planKey;

    private JsonNode planCall() {
      String key = effectiveConds() == null ? "" : effectiveConds();
      if (planOut == null || !key.equals(planKey)) {
        Bridge b = Bridge.fromOptions(new CaseInsensitiveStringMap(opts));
        planOut = b.call("splits", null, effectiveConds(), null);
        planKey = key;
      }
      return planOut;
    }

    /** Metadata-only planning statistics (records_in_range parity,
     * ha_mytile.cc:1424-1468): exact footer COUNT or the R-tree
     * upper bound, narrowed by pushed dim ranges — lets Spark pick
     * broadcast joins for genuinely small arrays instead of assuming
     * the default (huge) size.  Served from the cached splits call. */
    @Override
    public Statistics estimateStatistics() {
      JsonNode plan = planCall();
      JsonNode st =
          plan != null && plan.path("ok").asBoolean(false)
              ? plan.path("stats")
              : null;
      final boolean ok = st != null && !st.isNull() && st.has("rows");
      final long rows = ok ? st.path("rows").asLong() : 0;
      final long bytes = ok ? st.path("bytes").asLong() : 0;
      return new Statistics() {
        @Override
        public OptionalLong sizeInBytes() {
          return ok ? OptionalLong.of(bytes) : OptionalLong.empty();
        }

        @Override
        public OptionalLong numRows() {
          return ok ? OptionalLong.of(rows) : OptionalLong.empty();
        }
      };
    }

    @Override
    public StructType readSchema() {
      return schema;
    }

    @Override
    public String description() {
      return "TileDBBridgeRowScan"
          + (condsJson == null ? "" : " PushedConditions: " + condsJson)
          + (columnsJson == null ? "" : " PrunedColumns: " + columnsJson)
          + (limit == null ? "" : " PushedLimit: " + limit);
    }

    @Override
    public Batch toBatch() {
      return this;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      // split plan from the bridge (dim0 cuts / R-tree weights / string
      // boundary keys — the same planner read_array uses), intersected
      // with pushed dim ranges + condition-NED; empty:true = provably
      // no matching fragments -> ZERO partitions; a null entry =
      // unbounded full scan
      JsonNode out = planCall();
      List<InputPartition> parts = new ArrayList<>();
      if (out != null
          && out.path("ok").asBoolean(false)
          && out.path("empty").asBoolean(false)) {
        return new InputPartition[0];
      }
      if (out != null && out.path("ok").asBoolean(false)
          && out.path("splits").isArray() && out.path("splits").size() > 0) {
        for (JsonNode s : out.path("splits")) {
          parts.add(
              new RowsPartition(
                  opts, s.isNull() ? null : s.toString(), effectiveConds(), columnsJson, limit));
        }
      } else {
        parts.add(new RowsPartition(opts, null, effectiveConds(), columnsJson, limit));
      }
      return parts.toArray(new InputPartition[0]);
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new RowsReaderFactory(schema);
    }
  }

  static class RowsReaderFactory implements PartitionReaderFactory {
    private final StructType schema;

    RowsReaderFactory(StructType schema) {
      this.schema = schema;
    }

    @Override
    public PartitionReader<InternalRow> createReader(InputPartition p) {
      return new RowsReader((RowsPartition) p, schema);
    }

    @Override
    public boolean supportColumnarReads(InputPartition p) {
      return true;
    }

    @Override
    public PartitionReader<ColumnarBatch> createColumnarReader(InputPartition p) {
      return new ColumnarRowsReader((RowsPartition) p, schema);
    }
  }

  static class RowsPartition implements InputPartition {
    final Map<String, String> opts;
    final String rangesJson; // null = unbounded
    final String condsJson; // null = no pushed conditions
    final String columnsJson; // null = full schema order
    final Integer limit; // null = no pushed limit (advisory per split)

    RowsPartition(
        Map<String, String> opts,
        String rangesJson,
        String condsJson,
        String columnsJson,
        Integer limit) {
      this.opts = opts;
      this.rangesJson = rangesJson;
      this.condsJson = condsJson;
      this.columnsJson = columnsJson;
      this.limit = limit;
    }
  }

  static class RowsReader implements PartitionReader<InternalRow> {
    private final Process proc;
    private final StructType schema;
    private final ObjectMapper mapper = new ObjectMapper();
    private InternalRow current;
    // wire auto-detect: the bridge emits ARROW IPC when pyarrow is
    // importable (never starts with '['), JSON lines otherwise
    private BufferedReader jsonIn;
    private BufferAllocator allocator;
    private ArrowStreamReader arrow;
    private VectorSchemaRoot root;
    private int rowInBatch;
    private int batchRows;

    RowsReader(RowsPartition part, StructType schema) {
      this.schema = schema;
      Bridge b = Bridge.fromOptions(new CaseInsensitiveStringMap(part.opts));
      this.proc =
          b.start("rows", null, part.rangesJson, part.condsJson, part.columnsJson, null, part.limit);
      try {
        BufferedInputStream in = new BufferedInputStream(proc.getInputStream());
        in.mark(2);
        int first = in.read();
        if (first == -1) {
          jsonIn = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8));
          return; // empty stream: the JSON loop surfaces exit status
        }
        in.reset();
        if (first == '[') {
          jsonIn = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8));
        } else {
          allocator = new RootAllocator(Long.MAX_VALUE);
          arrow = new ArrowStreamReader(in, allocator);
          root = arrow.getVectorSchemaRoot();
          rowInBatch = 0;
          batchRows = 0;
        }
      } catch (Exception e) {
        proc.destroy();
        throw new RuntimeException("tiledb_agg rows bridge open failed: " + e, e);
      }
    }

    private static Object arrowToSpark(Object o, DataType t) {
      if (o == null) {
        return null;
      }
      if (t == DataTypes.StringType) {
        return UTF8String.fromString(o.toString());
      }
      if (t == DataTypes.LongType) {
        return ((Number) o).longValue();
      }
      if (t == DataTypes.IntegerType) {
        return ((Number) o).intValue();
      }
      if (t == DataTypes.ShortType) {
        return ((Number) o).shortValue();
      }
      if (t == DataTypes.ByteType) {
        return ((Number) o).byteValue();
      }
      if (t == DataTypes.DoubleType) {
        return ((Number) o).doubleValue();
      }
      if (t == DataTypes.FloatType) {
        return ((Number) o).floatValue();
      }
      if (t == DataTypes.BooleanType) {
        return (Boolean) o;
      }
      if (t == DataTypes.BinaryType) {
        return (byte[]) o;
      }
      throw new RuntimeException("tiledb_agg: unsupported arrow type " + t);
    }

    private boolean nextArrow() throws Exception {
      while (rowInBatch >= batchRows) {
        if (!arrow.loadNextBatch()) {
          int rc = proc.waitFor();
          if (rc != 0) {
            String err =
                new String(proc.getErrorStream().readAllBytes(), StandardCharsets.UTF_8);
            throw new RuntimeException("tiledb_agg rows bridge failed: " + err);
          }
          return false;
        }
        batchRows = root.getRowCount();
        rowInBatch = 0;
      }
      StructField[] fields = schema.fields();
      Object[] vals = new Object[fields.length];
      for (int i = 0; i < fields.length; i++) {
        vals[i] =
            arrowToSpark(root.getVector(i).getObject(rowInBatch), fields[i].dataType());
      }
      rowInBatch++;
      current = new GenericInternalRow(vals);
      return true;
    }

    @Override
    public boolean next() {
      try {
        if (arrow != null) {
          return nextArrow();
        }
        String line = jsonIn.readLine();
        if (line == null || line.isEmpty()) {
          int rc = proc.waitFor();
          if (rc != 0) {
            String err =
                new String(proc.getErrorStream().readAllBytes(), StandardCharsets.UTF_8);
            throw new RuntimeException("tiledb_agg rows bridge failed: " + err);
          }
          return false;
        }
        JsonNode arr = mapper.readTree(line);
        StructField[] fields = schema.fields();
        Object[] vals = new Object[fields.length];
        for (int i = 0; i < fields.length; i++) {
          vals[i] = jsonToSpark(arr.get(i), fields[i].dataType());
        }
        current = new GenericInternalRow(vals);
        return true;
      } catch (RuntimeException e) {
        throw e;
      } catch (Exception e) {
        throw new RuntimeException("tiledb_agg rows bridge read failed: " + e, e);
      }
    }

    @Override
    public InternalRow get() {
      return current;
    }

    @Override
    public void close() {
      try {
        if (arrow != null) {
          arrow.close();
        }
        if (allocator != null) {
          allocator.close();
        }
      } catch (Exception ignored) {
        // release-path best effort
      }
      proc.destroy();
    }
  }

  /** Columnar twin of RowsReader (r8 verdict #4): the bridge's Arrow
   * IPC batches are handed to Spark as ColumnarBatch — ArrowColumnVector
   * wraps each FieldVector zero-copy, eliminating the per-row
   * InternalRow conversion that dominated the fallback scan.  The
   * bridge emits an EXPLICIT Arrow schema equal to the pruned Spark
   * schema, so vector types match by construction.  A JSON-lines wire
   * (pyarrow unavailable in the bridge env) fills OnHeapColumnVector
   * chunks instead — same contract, still batch-shaped. */
  static class ColumnarRowsReader implements PartitionReader<ColumnarBatch> {
    private static final int JSON_CHUNK = 4096;
    private final Process proc;
    private final StructType schema;
    private final ObjectMapper mapper = new ObjectMapper();
    private BufferedReader jsonIn;
    private BufferAllocator allocator;
    private ArrowStreamReader arrow;
    private VectorSchemaRoot root;
    private ColumnarBatch current;

    ColumnarRowsReader(RowsPartition part, StructType schema) {
      this.schema = schema;
      Bridge b = Bridge.fromOptions(new CaseInsensitiveStringMap(part.opts));
      this.proc =
          b.start("rows", null, part.rangesJson, part.condsJson, part.columnsJson, null, part.limit);
      try {
        BufferedInputStream in = new BufferedInputStream(proc.getInputStream());
        in.mark(2);
        int first = in.read();
        if (first == -1) {
          jsonIn = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8));
          return; // empty stream: the JSON loop surfaces exit status
        }
        in.reset();
        if (first == '[') {
          jsonIn = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8));
        } else {
          allocator = new RootAllocator(Long.MAX_VALUE);
          arrow = new ArrowStreamReader(in, allocator);
          root = arrow.getVectorSchemaRoot();
        }
      } catch (Exception e) {
        proc.destroy();
        throw new RuntimeException("tiledb_agg columnar bridge open failed: " + e, e);
      }
    }

    private void checkExit() throws Exception {
      int rc = proc.waitFor();
      if (rc != 0) {
        String err =
            new String(proc.getErrorStream().readAllBytes(), StandardCharsets.UTF_8);
        throw new RuntimeException("tiledb_agg rows bridge failed: " + err);
      }
    }

    private static void putJson(
        OnHeapColumnVector col, int row, JsonNode v, DataType t) {
      if (v == null || v.isNull()) {
        col.putNull(row);
        return;
      }
      if (t == DataTypes.StringType) {
        col.putByteArray(row, v.asText().getBytes(StandardCharsets.UTF_8));
      } else if (t == DataTypes.LongType) {
        col.putLong(row, v.asLong());
      } else if (t == DataTypes.IntegerType) {
        col.putInt(row, (int) v.asLong());
      } else if (t == DataTypes.ShortType) {
        col.putShort(row, (short) v.asLong());
      } else if (t == DataTypes.ByteType) {
        col.putByte(row, (byte) v.asLong());
      } else if (t == DataTypes.DoubleType) {
        col.putDouble(row, v.asDouble());
      } else if (t == DataTypes.FloatType) {
        col.putFloat(row, (float) v.asDouble());
      } else if (t == DataTypes.BooleanType) {
        col.putBoolean(row, v.asBoolean());
      } else {
        throw new RuntimeException("tiledb_agg: unsupported columnar type " + t);
      }
    }

    @Override
    public boolean next() {
      try {
        if (arrow != null) {
          if (!arrow.loadNextBatch()) {
            checkExit();
            return false;
          }
          StructField[] fields = schema.fields();
          ColumnVector[] vecs = new ColumnVector[fields.length];
          for (int i = 0; i < fields.length; i++) {
            vecs[i] = new ArrowColumnVector(root.getVector(i));
          }
          current = new ColumnarBatch(vecs, root.getRowCount());
          return true;
        }
        StructField[] fields = schema.fields();
        OnHeapColumnVector[] cols =
            OnHeapColumnVector.allocateColumns(JSON_CHUNK, schema);
        int n = 0;
        String line;
        while (n < JSON_CHUNK && (line = jsonIn.readLine()) != null && !line.isEmpty()) {
          JsonNode arr = mapper.readTree(line);
          for (int i = 0; i < fields.length; i++) {
            putJson(cols[i], n, arr.get(i), fields[i].dataType());
          }
          n++;
        }
        if (n == 0) {
          checkExit();
          return false;
        }
        current = new ColumnarBatch(cols, n);
        return true;
      } catch (RuntimeException e) {
        throw e;
      } catch (Exception e) {
        throw new RuntimeException("tiledb_agg columnar bridge read failed: " + e, e);
      }
    }

    @Override
    public ColumnarBatch get() {
      return current;
    }

    @Override
    public void close() {
      try {
        if (arrow != null) {
          arrow.close();
        }
        if (allocator != null) {
          allocator.close();
        }
      } catch (Exception ignored) {
        // release-path best effort
      }
      proc.destroy();
    }
  }

  // ---- write path: staged fragment per task, atomic job commit -------------

  static class AggWriteBuilder implements WriteBuilder {
    private final StructType schema;
    private final CaseInsensitiveStringMap options;

    AggWriteBuilder(StructType schema, CaseInsensitiveStringMap options) {
      this.schema = schema;
      this.options = options;
    }

    @Override
    public Write build() {
      return new AggWrite(schema, options);
    }
  }

  public static class FragMessage implements WriterCommitMessage {
    // public: the driver may see this class through a DIFFERENT
    // classloader than the tasks (ADD JAR vs session artifacts), so
    // commit() reads the field reflectively instead of casting
    public final String frag; // null = empty task (elided write)

    public FragMessage(String frag) {
      this.frag = frag;
    }
  }

  /** Each task streams its rows to one bridge `write` process, which
   * stages an INVISIBLE native fragment (commit=False; data files
   * first, never a torn fragment).  Job commit makes the whole group
   * visible atomically with ONE bridge `commitfrags` call (.wrt marker
   * for a single fragment, a .con group file for many — the
   * distributed-consolidation crash contract).  A failed/speculative
   * task's staged directory stays invisible forever. */
  static class AggWrite implements Write, BatchWrite {
    private final StructType schema;
    private final Map<String, String> opts;

    AggWrite(StructType schema, CaseInsensitiveStringMap options) {
      this.schema = schema;
      this.opts = new java.util.HashMap<>(options.asCaseSensitiveMap());
    }

    @Override
    public BatchWrite toBatch() {
      return this;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return new AggWriterFactory(schema, opts);
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      List<String> frags = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        if (m == null) {
          continue;
        }
        String f;
        if (m instanceof FragMessage) {
          f = ((FragMessage) m).frag;
        } else {
          // same class via another classloader (ADD JAR): reflect
          try {
            java.lang.reflect.Field fld = m.getClass().getField("frag");
            fld.setAccessible(true);
            f = (String) fld.get(m);
          } catch (Exception e) {
            throw new RuntimeException(
                "tiledb_agg commit: unexpected message " + m.getClass(), e);
          }
        }
        if (f != null) {
          frags.add(f);
        }
      }
      if (frags.isEmpty()) {
        return;
      }
      Bridge b = Bridge.fromOptions(new CaseInsensitiveStringMap(opts));
      try {
        String fragsJson = new ObjectMapper().writeValueAsString(frags);
        Process p = b.startWithFrags("commitfrags", fragsJson);
        String out =
            new String(p.getInputStream().readAllBytes(), StandardCharsets.UTF_8);
        int rc = p.waitFor();
        JsonNode n = out.isEmpty() ? null : new ObjectMapper().readTree(out);
        if (rc != 0 || n == null || !n.path("ok").asBoolean(false)) {
          String err =
              new String(p.getErrorStream().readAllBytes(), StandardCharsets.UTF_8);
          throw new RuntimeException(
              "tiledb_agg commit failed (staged fragments remain "
                  + "invisible): " + err);
        }
      } catch (RuntimeException e) {
        throw e;
      } catch (Exception e) {
        throw new RuntimeException("tiledb_agg commit failed: " + e, e);
      }
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {
      // staged fragments have no commit marker: invisible by contract
    }
  }

  static class AggWriterFactory implements DataWriterFactory {
    private final StructType schema;
    private final Map<String, String> opts;

    AggWriterFactory(StructType schema, Map<String, String> opts) {
      this.schema = schema;
      this.opts = opts;
    }

    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      return new AggDataWriter(schema, opts);
    }
  }

  static class AggDataWriter implements DataWriter<InternalRow> {
    private final StructType schema;
    private final Process proc;
    private final java.io.BufferedWriter out;
    private final StringBuilder sb = new StringBuilder(256);

    AggDataWriter(StructType schema, Map<String, String> opts) {
      this.schema = schema;
      Bridge b = Bridge.fromOptions(new CaseInsensitiveStringMap(opts));
      this.proc = b.start("write", null, null, null, null, null);
      this.out =
          new java.io.BufferedWriter(
              new java.io.OutputStreamWriter(
                  proc.getOutputStream(), StandardCharsets.UTF_8),
              1 << 16);
    }

    @Override
    public void write(InternalRow row) throws java.io.IOException {
      sb.setLength(0);
      sb.append('[');
      StructField[] fields = schema.fields();
      for (int i = 0; i < fields.length; i++) {
        if (i > 0) {
          sb.append(',');
        }
        if (row.isNullAt(i)) {
          sb.append("null");
          continue;
        }
        DataType t = fields[i].dataType();
        if (t == DataTypes.LongType) {
          sb.append(row.getLong(i));
        } else if (t == DataTypes.IntegerType) {
          sb.append(row.getInt(i));
        } else if (t == DataTypes.ShortType) {
          sb.append(row.getShort(i));
        } else if (t == DataTypes.ByteType) {
          sb.append(row.getByte(i));
        } else if (t == DataTypes.DoubleType) {
          sb.append(row.getDouble(i));
        } else if (t == DataTypes.FloatType) {
          sb.append(row.getFloat(i));
        } else if (t == DataTypes.BooleanType) {
          sb.append(row.getBoolean(i));
        } else if (t == DataTypes.StringType) {
          appendJsonString(sb, row.getUTF8String(i).toString());
        } else if (t == DataTypes.BinaryType) {
          appendJsonString(
              sb, java.util.Base64.getEncoder().encodeToString(row.getBinary(i)));
        } else {
          throw new java.io.IOException(
              "tiledb_agg write: unsupported column type " + t);
        }
      }
      sb.append(']').append('\n');
      out.write(sb.toString());
    }

    private static void appendJsonString(StringBuilder sb, String s) {
      sb.append('"');
      for (int i = 0; i < s.length(); i++) {
        char c = s.charAt(i);
        if (c == '"' || c == '\\') {
          sb.append('\\').append(c);
        } else if (c < 0x20) {
          sb.append(String.format("\\u%04x", (int) c));
        } else {
          sb.append(c);
        }
      }
      sb.append('"');
    }

    @Override
    public WriterCommitMessage commit() throws java.io.IOException {
      try {
        out.close(); // EOF: the bridge writes + stages the fragment
        String outStr =
            new String(proc.getInputStream().readAllBytes(), StandardCharsets.UTF_8);
        int rc = proc.waitFor();
        JsonNode n =
            outStr.isEmpty() ? null : new ObjectMapper().readTree(outStr);
        if (rc != 0 || n == null || !n.path("ok").asBoolean(false)) {
          String err =
              new String(proc.getErrorStream().readAllBytes(), StandardCharsets.UTF_8);
          throw new java.io.IOException("tiledb_agg write task failed: " + err);
        }
        JsonNode f = n.path("frag");
        return new FragMessage(f.isNull() ? null : f.asText());
      } catch (java.io.IOException e) {
        throw e;
      } catch (Exception e) {
        throw new java.io.IOException("tiledb_agg write task failed: " + e);
      }
    }

    @Override
    public void abort() {
      proc.destroy(); // staged dir (if any) stays invisible
    }

    @Override
    public void close() {
      proc.destroy();
    }
  }
}
