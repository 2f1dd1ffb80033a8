// JVM DataSource V2 aggregate-pushdown shim for the native-array tier.
//
// The Python DataSource API has no SupportsPushDownAggregates hook, so a
// plain `SELECT COUNT(*)` over format("tiledb_native") full-scans (the
// documented q310 gap).  This thin Java provider closes the one
// group_by_handler behavior (TileDB-MariaDB mytile/ha_mytile.cc:607-715)
// unreachable from plain SQL: COUNT(*) / MIN / MAX / SUM with no GROUP BY
// are answered ENTIRELY from fragment metadata by delegating to the
// repo's Python decoder (count_native_array / attr_stats_native_array —
// same trust rules, never a guessed value) through a tiny subprocess
// bridge (tiledb_mariadb_spark.tools.jvm_bridge).  Queries the metadata
// cannot answer exactly fall back to an honest row scan through the same
// bridge (JSON-lines; the fast scan path remains the Python datasource —
// this format exists for the aggregate contract).
//
// Build/registration: tiledb_mariadb_spark.sources.jvm_agg compiles this
// file against the installed pyspark jars and loads it with ADD JAR, so
// `spark.read.format("tiledb_agg")` works in any session of this repo.

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.io.Serializable;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableProvider;
import org.apache.spark.sql.connector.expressions.Expression;
import org.apache.spark.sql.connector.expressions.NamedReference;
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
import org.apache.spark.sql.connector.read.SupportsPushDownAggregates;
import org.apache.spark.sql.sources.DataSourceRegister;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;
import org.apache.spark.unsafe.types.UTF8String;

public class TileDBAggDataSource implements TableProvider, DataSourceRegister {

  @Override
  public String shortName() {
    return "tiledb_agg";
  }

  @Override
  public StructType inferSchema(CaseInsensitiveStringMap options) {
    Bridge b = Bridge.fromOptions(options);
    JsonNode out = b.call("schema", null);
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

    Process start(String cmd, String aggs, String rangesJson) {
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

    /** Single-JSON-object commands (schema / agg / splits).  null on
     * launch failure. */
    JsonNode call(String cmd, String extra) {
      try {
        Process p = start(cmd, extra, null);
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

  // ---- table / scan builder ------------------------------------------------

  static class AggTable implements Table, SupportsRead {
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
      return java.util.EnumSet.of(TableCapability.BATCH_READ);
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap o) {
      // o carries the read options (path etc.); table options as fallback
      CaseInsensitiveStringMap eff = o.containsKey("path") ? o : options;
      return new AggScanBuilder(schema, eff);
    }
  }

  static class AggScanBuilder implements ScanBuilder, SupportsPushDownAggregates {
    private final StructType tableSchema;
    private final CaseInsensitiveStringMap options;
    private StructType aggSchema = null;
    private Object[] aggValues = null;

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

    @Override
    public boolean supportCompletePushDown(Aggregation aggregation) {
      return tryPush(aggregation);
    }

    @Override
    public boolean pushAggregation(Aggregation aggregation) {
      return aggValues != null || tryPush(aggregation);
    }

    private boolean tryPush(Aggregation aggregation) {
      if (aggValues != null) {
        return true;
      }
      if (aggregation.groupByExpressions().length != 0) {
        return false; // grouped aggregates need real rows
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
      JsonNode out = b.call("agg", String.join(";", reqs));
      if (out == null || !out.path("ok").asBoolean(false)) {
        return false; // metadata cannot prove it: honest scan fallback
      }
      JsonNode vals = out.path("values");
      if (!vals.isArray() || vals.size() != reqs.size()) {
        return false;
      }
      Object[] row = new Object[reqs.size()];
      StructField[] fields = new StructField[reqs.size()];
      for (int i = 0; i < reqs.size(); i++) {
        DataType t = types.get(i);
        JsonNode v = vals.get(i);
        if (v.isNull()) {
          row[i] = null;
        } else if (t == DataTypes.StringType) {
          row[i] = UTF8String.fromString(v.asText());
        } else if (t == DataTypes.DoubleType || t == DataTypes.FloatType) {
          row[i] = t == DataTypes.FloatType ? (Object) (float) v.asDouble() : v.asDouble();
        } else if (integral(t)) {
          long lv = v.asLong();
          row[i] =
              t == DataTypes.LongType
                  ? (Object) lv
                  : t == DataTypes.IntegerType
                      ? (Object) (int) lv
                      : t == DataTypes.ShortType ? (Object) (short) lv : (Object) (byte) lv;
        } else {
          return false; // unexpected stat type
        }
        fields[i] = new StructField("agg_" + i, t, true, org.apache.spark.sql.types.Metadata.empty());
      }
      this.aggValues = row;
      this.aggSchema = new StructType(fields);
      return true;
    }

    @Override
    public Scan build() {
      if (aggValues != null) {
        return new MetadataAggScan(aggSchema, aggValues);
      }
      return new RowScan(tableSchema, options);
    }
  }

  // ---- metadata-aggregate scan: ONE row, zero tiles decoded ----------------

  static class MetadataAggScan implements Scan, Batch {
    private final StructType schema;
    private final Object[] values;

    MetadataAggScan(StructType schema, Object[] values) {
      this.schema = schema;
      this.values = values;
    }

    @Override
    public StructType readSchema() {
      return schema;
    }

    @Override
    public String description() {
      return "TileDBMetadataAggScan(PushedAggregates)";
    }

    @Override
    public Batch toBatch() {
      return this;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      return new InputPartition[] {new OneRowPartition(values)};
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new OneRowReaderFactory();
    }
  }

  static class OneRowPartition implements InputPartition {
    final Object[] values;

    OneRowPartition(Object[] values) {
      this.values = values;
    }
  }

  static class OneRowReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition p) {
      Object[] values = ((OneRowPartition) p).values;
      return new PartitionReader<InternalRow>() {
        private boolean done = false;

        @Override
        public boolean next() {
          if (done) {
            return false;
          }
          done = true;
          return true;
        }

        @Override
        public InternalRow get() {
          return new GenericInternalRow(values.clone());
        }

        @Override
        public void close() {}
      };
    }
  }

  // ---- honest row-scan fallback (bridge JSON-lines) -------------------------

  static class RowScan implements Scan, Batch {
    private final StructType schema;
    private final Map<String, String> opts;

    RowScan(StructType schema, CaseInsensitiveStringMap options) {
      this.schema = schema;
      this.opts = new java.util.HashMap<>(options.asCaseSensitiveMap());
    }

    @Override
    public StructType readSchema() {
      return schema;
    }

    @Override
    public String description() {
      return "TileDBBridgeRowScan";
    }

    @Override
    public Batch toBatch() {
      return this;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      // split plan from the bridge (dim0 cuts / R-tree weights / string
      // boundary keys — the same planner read_array uses) so the
      // fallback scan parallelizes; a null entry = unbounded full scan
      Bridge b = Bridge.fromOptions(new CaseInsensitiveStringMap(opts));
      JsonNode out = b.call("splits", null);
      List<InputPartition> parts = new ArrayList<>();
      if (out != null && out.path("ok").asBoolean(false)
          && out.path("splits").isArray() && out.path("splits").size() > 0) {
        for (JsonNode s : out.path("splits")) {
          parts.add(new RowsPartition(opts, s.isNull() ? null : s.toString()));
        }
      } else {
        parts.add(new RowsPartition(opts, null));
      }
      return parts.toArray(new InputPartition[0]);
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      StructType s = schema;
      return p -> new RowsReader((RowsPartition) p, s);
    }
  }

  static class RowsPartition implements InputPartition {
    final Map<String, String> opts;
    final String rangesJson; // null = unbounded

    RowsPartition(Map<String, String> opts, String rangesJson) {
      this.opts = opts;
      this.rangesJson = rangesJson;
    }
  }

  static class RowsReader implements PartitionReader<InternalRow> {
    private final Process proc;
    private final BufferedReader out;
    private final StructType schema;
    private final ObjectMapper mapper = new ObjectMapper();
    private InternalRow current;

    RowsReader(RowsPartition part, StructType schema) {
      this.schema = schema;
      Bridge b = Bridge.fromOptions(new CaseInsensitiveStringMap(part.opts));
      this.proc = b.start("rows", null, part.rangesJson);
      this.out =
          new BufferedReader(new InputStreamReader(proc.getInputStream(), StandardCharsets.UTF_8));
    }

    @Override
    public boolean next() {
      try {
        String line = out.readLine();
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
          JsonNode v = arr.get(i);
          DataType t = fields[i].dataType();
          if (v == null || v.isNull()) {
            vals[i] = null;
          } else if (t == DataTypes.StringType) {
            vals[i] = UTF8String.fromString(v.asText());
          } else if (t == DataTypes.LongType) {
            vals[i] = v.asLong();
          } else if (t == DataTypes.IntegerType) {
            vals[i] = (int) v.asLong();
          } else if (t == DataTypes.ShortType) {
            vals[i] = (short) v.asLong();
          } else if (t == DataTypes.ByteType) {
            vals[i] = (byte) v.asLong();
          } else if (t == DataTypes.DoubleType) {
            vals[i] = v.asDouble();
          } else if (t == DataTypes.FloatType) {
            vals[i] = (float) v.asDouble();
          } else if (t == DataTypes.BooleanType) {
            vals[i] = v.asBoolean();
          } else {
            throw new RuntimeException(
                "tiledb_agg rows bridge: unsupported type " + t + " for " + fields[i].name());
          }
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
      proc.destroy();
    }
  }
}
