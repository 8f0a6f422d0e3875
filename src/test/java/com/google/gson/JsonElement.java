// Minimal test-scope stub of the gson API surface used by the reference jar
// (oracle runs only — SURVEY.md §5.3). Covers exactly the members touched by
// FileDataLoader.java:33-57, AbstractDataLoader.java:334-368,
// TimeserieOutlier.java:74-85. NOT on the library (compile) classpath.
package com.google.gson;

public abstract class JsonElement {
    public JsonObject getAsJsonObject() {
        return (JsonObject) this;
    }

    public abstract long getAsLong();

    public abstract String getAsString();

    @Override
    public abstract String toString();
}
